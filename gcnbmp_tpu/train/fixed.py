"""Training over fixed precomputed drug embeddings.

The reference's mol2vec / molecular-autoencoder / SSP baselines
(mol2vec_based_model.py, unsupervised_feature.py, my_utils/parsers.py
Mol2VecParserForPair:247 / MolAutoencoderParserForPair:454 /
SSPParserForPair:647) train only the scoring head over frozen per-drug
feature vectors.  Here: load an id->vector table, join it onto a pair
CSV, and fit a FixedEmbeddingPredictor head.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from gcnbmp_tpu.models.heads import HEADS
from gcnbmp_tpu.models.predictor import FixedEmbeddingPredictor
from gcnbmp_tpu.train.loop import sigmoid_cross_entropy
from gcnbmp_tpu.train.metrics import binary_metrics


def load_embedding_table(path: str, id_col: str = "cid",
                         vec_col: str = "entity") -> Dict[str, np.ndarray]:
    """Load id -> vector from a pickle dict or a CSV with a
    space-separated vector column (the drug_list_with_representation.csv
    format written by eval exports)."""
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            table = pickle.load(f)
        return {str(k): np.asarray(v, np.float32) for k, v in table.items()}
    df = pd.read_csv(path)
    return {
        str(row[id_col]): np.fromstring(str(row[vec_col]), sep=" ", dtype=np.float32)
        for _, row in df.iterrows()
    }


def pair_embeddings(
    pair_csv: str, table: Dict[str, np.ndarray],
    id_cols: Sequence[str] = ("drugbank_id_1", "drugbank_id_2"),
    label_col: str = "label",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    df = pd.read_csv(pair_csv)
    e1, e2, y = [], [], []
    for _, row in df.iterrows():
        a, b = str(row[id_cols[0]]), str(row[id_cols[1]])
        if a in table and b in table:
            e1.append(table[a])
            e2.append(table[b])
            y.append(float(row[label_col]))
    return np.stack(e1), np.stack(e2), np.asarray(y, np.float32)


def train_fixed_embedding_head(
    e1: np.ndarray, e2: np.ndarray, labels: np.ndarray,
    val: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    sim_method: str = "hole",
    class_num: int = 1,
    net_hidden_dims: Tuple[int, ...] = (32, 16),
    learning_rate: float = 1e-3,
    epochs: int = 100,
    batch_size: int = 128,
    seed: int = 2018,
) -> Dict:
    """Fit a scoring head over frozen embeddings; returns params + metrics."""
    head_kwargs = {"out_dim": class_num}
    if sim_method in ("hole", "mlp", "symmlp", "ntn", "dist-mult"):
        head_kwargs["hidden_dims"] = net_hidden_dims
    predictor = FixedEmbeddingPredictor(
        head=HEADS[sim_method](name="head", **head_kwargs)
    )
    rng = jax.random.PRNGKey(seed)
    variables = predictor.init(rng, jnp.asarray(e1[:2]), jnp.asarray(e2[:2]))
    params = variables["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, a, b, y):
        def loss_fn(p):
            logits = predictor.apply({"params": p}, a, b)
            return sigmoid_cross_entropy(jnp.reshape(logits, y.shape), y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    np_rng = np.random.default_rng(seed)
    n = len(labels)
    # datasets smaller than batch_size would otherwise train ZERO steps
    # (and leave `loss` unbound below)
    batch_size = min(batch_size, n)
    losses = []
    for _ in range(epochs):
        order = np_rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(e1[idx]), jnp.asarray(e2[idx]),
                jnp.asarray(labels[idx]),
            )
        losses.append(float(loss))

    @jax.jit
    def infer(p, a, b):
        return predictor.apply({"params": p}, a, b)

    out = {"params": params, "losses": losses}
    logits = np.asarray(infer(params, jnp.asarray(e1), jnp.asarray(e2)))
    out["train_metrics"] = binary_metrics(logits, labels)
    if val is not None:
        v1, v2, vy = val
        vlogits = np.asarray(infer(params, jnp.asarray(v1), jnp.asarray(v2)))
        out["val_metrics"] = binary_metrics(vlogits, vy)
    return out
