"""Packed supergraph batching — the TPU-first high-throughput layout.

Instead of padding every molecule to a common N (the reference's
concat_mols approach, which wastes (N_pad - n_i) rows per molecule), many
small molecules are bin-packed into fixed tiles of TILE=128 atoms — the
MXU's native dimension.  A batch becomes:

    atom_ids  (P, 128)  int32   atoms of all packed molecules
    adj       (P, 4, 128, 128)  block-diagonal edge-type adjacency
    mol_id    (P, 128)  int32   molecule index per slot (pads -> num_mols)
    node_mask (P, 128)  f32

Molecules never split across tiles, so flattened mol_id is sorted —
per-molecule readout is a sorted segment_sum, which XLA lowers
efficiently on TPU.  Message passing is one (128, 512) x (512, H) MXU
matmul per tile (see ops/aggregate.py) with ~90+% real-atom occupancy vs
~25-55% for pad-to-max batches of drug-sized molecules.

No reference counterpart (the reference's only batching is pad-to-max,
chainer_chemistry concat_mols) — this is new design per SURVEY §7.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from gcnbmp_tpu.chem.featurize import MolGraph, NUM_EDGE_TYPES

TILE = 128


@dataclass
class PackedGraphBatch:
    """A pytree of numpy arrays; all molecules of a pair batch packed
    together.  ``left_index``/``right_index`` map pair i -> molecule ids."""

    atom_ids: np.ndarray   # (P, TILE) int32
    adj: np.ndarray        # (P, 4, TILE, TILE) float32
    mol_id: np.ndarray     # (P, TILE) int32; padding slots = num_mols
    node_mask: np.ndarray  # (P, TILE) float32
    num_mols: int
    left_index: np.ndarray   # (B,) int32
    right_index: np.ndarray  # (B,) int32
    labels: np.ndarray       # (B,) or (B, C) float32

    @property
    def num_tiles(self) -> int:
        return int(self.atom_ids.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.adj.sum())

    @property
    def occupancy(self) -> float:
        return float(self.node_mask.mean())


def _first_fit_pack(sizes: Sequence[int], tile: int) -> List[List[int]]:
    """First-fit-decreasing bin packing; returns list of molecule-index
    lists per tile."""
    order = np.argsort(np.asarray(sizes))[::-1]
    bins: List[List[int]] = []
    space: List[int] = []
    for idx in order:
        s = sizes[idx]
        if s > tile:
            raise ValueError(f"molecule with {s} atoms exceeds tile size {tile}")
        placed = False
        for b in range(len(bins)):
            if space[b] >= s:
                bins[b].append(int(idx))
                space[b] -= s
                placed = True
                break
        if not placed:
            bins.append([int(idx)])
            space.append(tile - s)
    return bins


def pack_graphs(
    graphs: Sequence[MolGraph],
    labels: np.ndarray,
    tile: int = TILE,
    num_tiles: Optional[int] = None,
) -> PackedGraphBatch:
    """Pack an interleaved list of pair molecules [l0, r0, l1, r1, ...].

    ``num_tiles``: pad the tile count to a fixed value for jit shape
    stability (extra tiles are empty).
    """
    assert len(graphs) % 2 == 0
    n_mols = len(graphs)
    sizes = [g.num_atoms for g in graphs]
    bins = _first_fit_pack(sizes, tile)
    p = len(bins)
    if num_tiles is not None:
        if num_tiles < p:
            raise ValueError(f"num_tiles={num_tiles} < required {p}")
        p = num_tiles
    atom_ids = np.zeros((p, tile), np.int32)
    adj = np.zeros((p, NUM_EDGE_TYPES, tile, tile), np.float32)
    mol_id = np.full((p, tile), n_mols, np.int32)
    node_mask = np.zeros((p, tile), np.float32)
    # order molecules within tiles so flattened mol_id is sorted
    placements: List[Tuple[int, int, int]] = []  # (mol_idx, tile, offset)
    cursor = 0
    for b, members in enumerate(bins):
        off = 0
        for idx in sorted(members):
            placements.append((idx, b, off))
            off += sizes[idx]
    # remap mol ids to a sorted-by-(tile, offset) order
    placements.sort(key=lambda t: (t[1], t[2]))
    remap = np.empty(n_mols, np.int32)
    for new_id, (orig_idx, b, off) in enumerate(placements):
        remap[orig_idx] = new_id
        g = graphs[orig_idx]
        k = g.num_atoms
        atom_ids[b, off : off + k] = g.atom_ids
        adj[b, g.edge_type, g.edge_src + off, g.edge_dst + off] = 1.0
        mol_id[b, off : off + k] = new_id
        node_mask[b, off : off + k] = 1.0
    left = remap[0::2].astype(np.int32)
    right = remap[1::2].astype(np.int32)
    return PackedGraphBatch(
        atom_ids=atom_ids, adj=adj, mol_id=mol_id, node_mask=node_mask,
        num_mols=n_mols, left_index=left, right_index=right,
        labels=np.asarray(labels, np.float32),
    )


def pack_pair_dataset_batch(ds, indices: Sequence[int], tile: int = TILE,
                            num_tiles: Optional[int] = None) -> PackedGraphBatch:
    """Build a PackedGraphBatch from PairDataset rows."""
    graphs: List[MolGraph] = []
    labels = []
    for i in indices:
        graphs.append(ds.graphs1[i])
        graphs.append(ds.graphs2[i])
        labels.append(np.atleast_1d(ds.labels[i]).astype(np.float32))
    labels = np.stack(labels)
    if labels.shape[-1] == 1:
        labels = labels[:, 0]
    return pack_graphs(graphs, labels, tile=tile, num_tiles=num_tiles)


def estimate_tiles(sizes: Sequence[int], tile: int = TILE, slack: float = 1.1) -> int:
    """Upper-bound tile count for fixed-shape jit across shuffled batches."""
    total = int(np.sum(sizes))
    return int(np.ceil(slack * total / tile)) + 1
