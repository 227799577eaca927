"""Model layer: encoders, co-attention, heads, pair predictor."""

from gcnbmp_tpu.models.ggnn import GGNN, GatedReadout, GGNNMessage, GGNNUpdate
from gcnbmp_tpu.models.relgcn import RelGCN, RelGCNUpdate, rescale_adj
from gcnbmp_tpu.models.gin import GIN, GINUpdate
from gcnbmp_tpu.models.mpnn import MPNN, EdgeNet
from gcnbmp_tpu.models.nfp import NFP, NFPUpdate
from gcnbmp_tpu.models.readouts import (
    CommonGGNNReadout,
    MPNNReadout,
    NFPReadout,
    Set2Set,
)
from gcnbmp_tpu.models.heads import (
    HEADS,
    CosineHead,
    DistMultHead,
    HolEHead,
    MLPHead,
    NTNHead,
    SymMLPHead,
)
from gcnbmp_tpu.models.predictor import PairPredictor, set_up_predictor


def _build_ggnn(name, out_dim, hidden_dim, n_layers, concat_hidden,
                layer_aggregator, dropout_rate, batch_normalization,
                weight_tying):
    return GGNN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        concat_hidden=concat_hidden, layer_aggregator=layer_aggregator,
        dropout_rate=dropout_rate, batch_normalization=batch_normalization,
        weight_tying=weight_tying, name=name,
    )


def _build_relgcn(name, out_dim, hidden_dim, n_layers, concat_hidden,
                  layer_aggregator, dropout_rate, batch_normalization,
                  weight_tying):
    return RelGCN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers, name=name,
    )


def _build_gin(name, out_dim, hidden_dim, n_layers, concat_hidden,
               layer_aggregator, dropout_rate, batch_normalization,
               weight_tying):
    return GIN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        dropout_ratio=dropout_rate, concat_hidden=concat_hidden,
        weight_tying=weight_tying, name=name,
    )


def _build_mpnn(name, out_dim, hidden_dim, n_layers, concat_hidden,
                layer_aggregator, dropout_rate, batch_normalization,
                weight_tying):
    return MPNN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        concat_hidden=concat_hidden, weight_tying=weight_tying, name=name,
    )


def _build_nfp(name, out_dim, hidden_dim, n_layers, concat_hidden,
               layer_aggregator, dropout_rate, batch_normalization,
               weight_tying):
    return NFP(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        concat_hidden=concat_hidden, name=name,
    )


# Encoder registry (--method strings, reference train_ddi_modify_eval2.py:331).
ENCODERS = {
    "ggnn": _build_ggnn,
    "relgcn": _build_relgcn,
    "gin": _build_gin,
    "mpnn": _build_mpnn,
    "nfp": _build_nfp,
}

__all__ = [
    "GGNN", "GatedReadout", "GGNNMessage", "GGNNUpdate",
    "RelGCN", "RelGCNUpdate", "rescale_adj",
    "GIN", "GINUpdate",
    "MPNN", "EdgeNet",
    "NFP", "NFPUpdate",
    "CommonGGNNReadout", "MPNNReadout", "NFPReadout", "Set2Set",
    "HEADS", "ENCODERS",
    "CosineHead", "DistMultHead", "HolEHead", "MLPHead", "NTNHead",
    "SymMLPHead",
    "PairPredictor", "set_up_predictor",
]
