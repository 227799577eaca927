"""Embedding-similarity vs. known-DDI correlation analysis.

Reference: result_analysis.py:27-349 — for each drug pair, compare the
similarity of their learned embeddings with the number of interactions
they share in the known DDI matrix; report the Pearson correlation (the
reference's committed artifact correlation_all_0.7824.png).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gcnbmp_tpu.eval.similarity import cosine_similarity_matrix


def shared_interaction_counts(ddi_matrix: np.ndarray) -> np.ndarray:
    """C[i,j] = number of partners both i and j interact with."""
    m = (np.asarray(ddi_matrix) > 0).astype(np.float64)
    return m @ m.T


def embedding_ddi_correlation(
    embeddings: np.ndarray,
    ddi_matrix: np.ndarray,
    similarity: str = "cosine",
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Pearson correlation between pairwise embedding similarity and
    shared-interaction count, over the upper triangle (i < j).

    Returns (correlation, sim_values, count_values).
    """
    if similarity == "cosine":
        sims = cosine_similarity_matrix(np.asarray(embeddings, np.float64))
    else:
        from gcnbmp_tpu.eval.similarity import (
            continuous_jaccard_matrix,
            extended_jaccard_matrix,
        )

        sims = {
            "jaccard": continuous_jaccard_matrix,
            "extended-jaccard": extended_jaccard_matrix,
        }[similarity](np.asarray(embeddings, np.float64))
    counts = shared_interaction_counts(ddi_matrix)
    iu = np.triu_indices(sims.shape[0], k=1)
    s, c = sims[iu], counts[iu]
    if s.std() == 0 or c.std() == 0:
        return float("nan"), s, c
    corr = float(np.corrcoef(s, c)[0, 1])
    return corr, s, c


def correlation_plot(
    sim_values: np.ndarray,
    count_values: np.ndarray,
    corr: float,
    out_png: str,
) -> None:
    """Scatter of embedding similarity vs shared-interaction count with a
    least-squares fit line — the reference's committed
    correlation_all_0.7824.png artifact (result_analysis.py:27-349)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = np.asarray(sim_values, np.float64)
    c = np.asarray(count_values, np.float64)
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.scatter(c, s, s=4, alpha=0.15, linewidths=0, color="#3b6fb6")
    if c.std() > 0:
        slope, intercept = np.polyfit(c, s, 1)
        xs = np.linspace(c.min(), c.max(), 100)
        ax.plot(xs, slope * xs + intercept, color="#c0392b", linewidth=1.5)
    ax.set_xlabel("shared interaction count")
    ax.set_ylabel("embedding similarity")
    ax.set_title(f"Pearson correlation = {corr:.4f}")
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
