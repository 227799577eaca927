"""Atom-level saliency maps + SVG molecule rendering.

Reference: eval_saliency_map.py — chainer-chemistry GradientCalculator /
IntegratedGradientsCalculator (+ GaussianNoiseSampler for Bayes-grad) on
atom embeddings, rendered per-atom to SVG.

JAX re-design: every encoder accepts pre-embedded float inputs (the
reference's dtype dispatch), so saliency is simply ``jax.grad`` of the
pair logit w.r.t. the two embedding tensors — vanilla gradients,
integrated gradients (path integral from zero), and Bayes-grad (expected
|grad| under Gaussian embedding noise) all evaluate that same gradient
function at different points.  Rendering uses a dependency-free
force-directed 2D layout (no RDKit in this environment).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcnbmp_tpu.chem.mol import Mol


def embedding_grad_fn(predictor, params, adj1, adj2, mask1, mask2):
    """Returns (f_grad, embed) where ``embed(atoms)`` looks up the
    encoder's embedding table and ``f_grad(h1, h2) -> (g1, g2)`` is the
    gradient of the summed pair logit w.r.t. both embedding tensors."""
    table = params["encoder"]["embed"]["embedding"]

    def embed(atoms):
        return jnp.take(table, atoms, axis=0)

    def logit_sum(h1, h2):
        out = predictor.apply(
            {"params": params}, h1, adj1, h2, adj2, mask1, mask2,
            deterministic=True,
        )
        return jnp.sum(out)

    return jax.jit(jax.grad(logit_sum, argnums=(0, 1))), embed


def atom_saliency(
    predictor,
    params,
    atoms1, adj1, atoms2, adj2, mask1=None, mask2=None,
    method: str = "gradient",
    steps: int = 16,
    n_samples: int = 8,
    noise_scale: float = 0.1,
    rng: Optional[jax.Array] = None,
    multiply_input: bool = True,
) -> Dict[str, np.ndarray]:
    """Per-atom saliency for both molecules of each pair.

    Returns {'mol1': (B, N), 'mol2': (B, N)}: L2 norm over features of
    the embedding gradient (times the embedding when multiply_input,
    the IntegratedGradients convention).
    """
    from gcnbmp_tpu.models.relgcn import RelGCN

    enc = getattr(predictor, "encoder", None)
    if isinstance(enc, RelGCN) and not enc.pre_embedded:
        # RelGCN's float path is the DrugFP raw-feature layer
        # (embed_linear); clone it so float inputs mean "already
        # embedded", the same contract GGNN's float path has.  Parameter
        # structure is unchanged, so the trained params apply verbatim.
        predictor = predictor.clone(encoder=enc.clone(pre_embedded=True))
    grad_fn, embed = embedding_grad_fn(predictor, params, adj1, adj2, mask1, mask2)
    h1, h2 = embed(atoms1), embed(atoms2)

    if method == "gradient":
        g1, g2 = grad_fn(h1, h2)
    elif method == "integrated":
        g1 = jnp.zeros_like(h1)
        g2 = jnp.zeros_like(h2)
        for alpha in (np.arange(steps) + 0.5) / steps:
            d1, d2 = grad_fn(alpha * h1, alpha * h2)
            g1, g2 = g1 + d1, g2 + d2
        g1, g2 = g1 / steps, g2 / steps
    elif method == "bayes":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        g1 = jnp.zeros_like(h1)
        g2 = jnp.zeros_like(h2)
        for _ in range(n_samples):
            rng, k1, k2 = jax.random.split(rng, 3)
            d1, d2 = grad_fn(
                h1 + noise_scale * jax.random.normal(k1, h1.shape),
                h2 + noise_scale * jax.random.normal(k2, h2.shape),
            )
            g1, g2 = g1 + jnp.abs(d1), g2 + jnp.abs(d2)
        g1, g2 = g1 / n_samples, g2 / n_samples
    else:
        raise ValueError(f"unknown saliency method {method!r}")

    if multiply_input:
        g1, g2 = g1 * h1, g2 * h2
    return {
        "mol1": np.linalg.norm(np.asarray(g1), axis=-1),
        "mol2": np.linalg.norm(np.asarray(g2), axis=-1),
    }


# ---------------------------------------------------------------------------
# SVG rendering (dependency-free 2D layout)
# ---------------------------------------------------------------------------

def layout_2d(mol: Mol, iterations: int = 200, seed: int = 0) -> np.ndarray:
    """Simple force-directed 2D layout; returns (N, 2) coordinates."""
    n = mol.num_atoms
    rng = np.random.default_rng(seed)
    pos = rng.normal(scale=0.1, size=(n, 2))
    if n == 1:
        return np.zeros((1, 2))
    edges = [(b.a1, b.a2) for b in mol.bonds]
    ideal = 1.0
    for _ in range(iterations):
        disp = np.zeros_like(pos)
        diff = pos[:, None, :] - pos[None, :, :]
        dist2 = np.maximum((diff ** 2).sum(-1), 1e-4)
        disp += (diff / dist2[..., None] * 0.3).sum(axis=1)
        for a, b in edges:
            d = pos[a] - pos[b]
            dist = max(np.linalg.norm(d), 1e-4)
            f = (dist - ideal) * 0.5 * d / dist
            disp[a] -= f
            disp[b] += f
        pos += np.clip(disp, -0.2, 0.2)
    pos -= pos.mean(axis=0)
    return pos / max(np.abs(pos).max(), 1e-3)


def render_molecule_svg(
    mol: Mol,
    atom_values: Optional[np.ndarray] = None,
    size: int = 300,
) -> str:
    """Render a molecule as SVG with atoms colored by saliency
    (the SmilesVisualizer role, reference eval_saliency_map.py)."""
    pos = layout_2d(mol)
    pad = 30
    xy = (pos * (size / 2 - pad)) + size / 2
    vals = None
    if atom_values is not None:
        vals = np.asarray(atom_values, np.float64)[: mol.num_atoms]
        vmax = vals.max() if vals.max() > 0 else 1.0
        vals = vals / vmax

    def color(i):
        if vals is None:
            return "#cccccc"
        gb = int(255 * (1 - float(vals[i])))
        return f"#ff{gb:02x}{gb:02x}"

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}">',
        f'<rect width="{size}" height="{size}" fill="white"/>',
    ]
    for b in mol.bonds:
        x1, y1 = xy[b.a1]
        x2, y2 = xy[b.a2]
        w = {0: 1.5, 1: 3.0, 2: 4.5, 3: 2.5}[int(b.order)]
        dash = ' stroke-dasharray="4,2"' if int(b.order) == 3 else ""
        parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="black" stroke-width="{w}"{dash}/>'
        )
    for i, a in enumerate(mol.atoms):
        x, y = xy[i]
        parts.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="11" fill="{color(i)}" '
            f'stroke="black" stroke-width="0.5"/>'
        )
        parts.append(
            f'<text x="{x:.1f}" y="{y + 4:.1f}" text-anchor="middle" '
            f'font-size="11" font-family="sans-serif">{a.symbol}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)
