"""MPNN encoder (reference: models/mpnn.py:22-111,
models/update/mpnn_update.py:12-101).

message_func in {edgenet, ggnn}; update = GRU; readout in {set2set, ggnn}.

EdgeNet semantics (reference EdgeNet.__call__:50-101): the per-pair edge
vector — one-hot over 4 bond types, or all-zero for non-edges — is mapped
through a 2-layer MLP to a ch x ch matrix M(e_ij); messages are
``in_i = sum_j M(e_ij) h_j`` plus the transposed-adjacency "out" copy,
concatenated.  Crucially the MLP has biases, so non-edges contribute
M(0) != 0 — every node receives a dense background term.

TPU-first rewrite: e_ij takes only 5 distinct values (4 one-hots + zero),
so instead of evaluating the MLP at N^2 pairs and doing an
(N*ch x N*ch) blocked matmul (the reference's approach), we precompute
the 5 matrices M_0..M_4 once per call and compute

    in_i = sum_t A_t[i,:] @ (h M_t^T) + (1*h_sum - any_edge[i,:] @ h) M_0^T

— exactly the same math as the reference (including the non-edge
background and the j==i self-pair), at O(4) MLP evals and a handful of
(N, N) x (N, ch) matmuls.  ``nn_layer_in`` and ``nn_layer_out`` alias the
same link in the reference (mpnn_update.py:43-45), so one MLP is shared.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gcnbmp_tpu.models.ggnn import GGNNMessage
from gcnbmp_tpu.models.layers import ChainerGRUCell, EmbedAtomID, LecunNormal, MAX_ATOMIC_NUM
from gcnbmp_tpu.models.readouts import CommonGGNNReadout, MPNNReadout

NUM_EDGE_TYPE = 4


class EdgeNet(nn.Module):
    """Per-edge-type matrix messages with the reference's non-edge
    background term.  Returns concat(message_in, message_out): (B, N, 2ch).

    ``mask``: when given, padded atoms are excluded from the non-edge
    background sum (corrected behavior — the reference's background sums
    over ALL padded slots, making it pad-size-dependent; mask=None
    reproduces that quirk for parity)."""

    out_channels: int
    edge_hidden_dim: int = 16

    @nn.compact
    def __call__(self, h: jnp.ndarray, adj: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, n, ch = h.shape
        assert ch == self.out_channels, (ch, self.out_channels)
        # MLP over the 5 possible edge vectors: zero + 4 one-hots.
        basis = jnp.concatenate(
            [jnp.zeros((1, NUM_EDGE_TYPE)), jnp.eye(NUM_EDGE_TYPE)], axis=0
        )  # (5, 4)
        z = nn.relu(nn.Dense(self.edge_hidden_dim, kernel_init=LecunNormal(), name="nn1")(basis))
        mats = nn.Dense(ch * ch, kernel_init=LecunNormal(), name="nn2")(z)
        mats = mats.reshape(5, ch, ch)  # M_0 (non-edge), M_1..M_4
        m0, m_types = mats[0], mats[1:]  # (ch, ch), (4, ch, ch)

        # h transformed by each matrix: reference computes M @ h_j, i.e.
        # message contribution M(e_ij) h_j.
        hm = jnp.einsum("tcd,bjd->btjc", m_types - m0, h)  # (B, 4, N, ch)
        h_bg = h if mask is None else h * mask[..., None]
        h_m0_sum = jnp.einsum("cd,bjd->bc", m0, h_bg)  # (B, ch): M0 sum_j h_j

        def directed(a):  # a: (B, 4, N, N) adjacency in chosen direction
            msg = jnp.einsum("btij,btjc->bic", a, hm)
            return msg + h_m0_sum[:, None, :]

        message_in = directed(adj)
        message_out = directed(jnp.swapaxes(adj, 2, 3))
        return jnp.concatenate([message_in, message_out], axis=-1)


class MPNN(nn.Module):
    out_dim: int
    hidden_dim: int = 16
    n_layers: int = 4
    n_atom_types: int = MAX_ATOMIC_NUM
    concat_hidden: bool = False
    weight_tying: bool = True
    message_func: str = "edgenet"
    readout_func: str = "set2set"
    edge_hidden_dim: int = 16

    @nn.compact
    def __call__(
        self,
        atoms: jnp.ndarray,
        adj: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        if self.message_func not in ("edgenet", "ggnn"):
            raise ValueError(f"invalid message function {self.message_func!r}")
        if self.readout_func not in ("set2set", "ggnn"):
            raise ValueError(f"invalid readout function {self.readout_func!r}")
        if jnp.issubdtype(atoms.dtype, jnp.integer):
            h = EmbedAtomID(self.n_atom_types, self.hidden_dim, name="embed")(atoms)
        else:
            h = atoms
        h0 = h
        n_message = 1 if self.weight_tying else self.n_layers
        if self.message_func == "edgenet":
            msgs = [
                EdgeNet(self.hidden_dim, self.edge_hidden_dim, name=f"message_{i}")
                for i in range(n_message)
            ]
        else:
            msgs = [
                GGNNMessage(self.hidden_dim, name=f"message_{i}")
                for i in range(n_message)
            ]
        # One GRU per update layer; its state persists across steps only
        # when layers are tied (each untied layer's GRU is fresh —
        # reference MPNNUpdate owns its GRU, reset per forward).
        grus = [
            ChainerGRUCell(self.hidden_dim, name=f"gru_{i}") for i in range(n_message)
        ]
        n_readout = self.n_layers if self.concat_hidden else 1
        if self.readout_func == "ggnn":
            readouts = [
                CommonGGNNReadout(self.out_dim, name=f"readout_{i}")
                for i in range(n_readout)
            ]
        else:
            readouts = [
                MPNNReadout(self.out_dim, self.hidden_dim, name=f"readout_{i}")
                for i in range(n_readout)
            ]

        gru_states = [jnp.zeros_like(h) for _ in range(n_message)]
        g_list = []
        for step in range(self.n_layers):
            k = 0 if self.weight_tying else step
            if self.message_func == "edgenet":
                x = msgs[k](h, adj, mask)  # already (B, N, 2ch)
            else:
                m = msgs[k](h, adj)
                x = jnp.concatenate([h, m], axis=-1)
            gru_states[k] = grus[k](gru_states[k], x)
            h = gru_states[k]
            if self.concat_hidden:
                if self.readout_func == "ggnn":
                    g_list.append(readouts[step](h, h0, mask))
                else:
                    g_list.append(readouts[step](h, mask))
        aux = {"atoms": h, "h0": h0, "h_list": [], "g_list": g_list}
        if self.concat_hidden:
            return jnp.concatenate(g_list, axis=-1), aux
        if self.readout_func == "ggnn":
            return readouts[0](h, h0, mask), aux
        return readouts[0](h, mask), aux
