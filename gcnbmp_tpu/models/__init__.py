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
                weight_tying, attention=False, update_attention=False,
                context=False):
    return GGNN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        concat_hidden=concat_hidden, layer_aggregator=layer_aggregator,
        dropout_rate=dropout_rate, batch_normalization=batch_normalization,
        weight_tying=weight_tying, use_attention=bool(attention),
        update_attention=bool(update_attention), context=bool(context),
        name=name,
    )


def _build_relgcn(name, out_dim, hidden_dim, n_layers, concat_hidden,
                  layer_aggregator, dropout_rate, batch_normalization,
                  weight_tying, **attn_opts):
    _reject_attention_opts("relgcn", attn_opts)
    return RelGCN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers, name=name,
    )


def _build_gin(name, out_dim, hidden_dim, n_layers, concat_hidden,
               layer_aggregator, dropout_rate, batch_normalization,
               weight_tying, **attn_opts):
    _reject_attention_opts("gin", attn_opts)
    return GIN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        dropout_ratio=dropout_rate, concat_hidden=concat_hidden,
        weight_tying=weight_tying, name=name,
    )


def _build_mpnn(name, out_dim, hidden_dim, n_layers, concat_hidden,
                layer_aggregator, dropout_rate, batch_normalization,
                weight_tying, **attn_opts):
    _reject_attention_opts("mpnn", attn_opts)
    return MPNN(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        concat_hidden=concat_hidden, weight_tying=weight_tying, name=name,
    )


def _build_nfp(name, out_dim, hidden_dim, n_layers, concat_hidden,
               layer_aggregator, dropout_rate, batch_normalization,
               weight_tying, **attn_opts):
    _reject_attention_opts("nfp", attn_opts)
    return NFP(
        out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
        concat_hidden=concat_hidden, name=name,
    )


def _reject_attention_opts(method, opts):
    bad = [k for k, v in opts.items() if v]
    if bad:
        raise ValueError(
            f"encoder {method!r} does not support {bad} "
            "(GGNN-only options)"
        )


def _build_ggnn_dev(variant):
    def build(name, out_dim, hidden_dim, n_layers, concat_hidden,
              layer_aggregator, dropout_rate, batch_normalization,
              weight_tying, **attn_opts):
        _reject_attention_opts(f"ggnn-dev ({variant})", attn_opts)
        from gcnbmp_tpu.models.ggnn_dev import GGNNDev

        return GGNNDev(
            out_dim=out_dim, hidden_dim=hidden_dim, n_layers=n_layers,
            concat_hidden=concat_hidden, dropout_rate=dropout_rate,
            weight_tying=weight_tying, update_variant=variant, name=name,
        )

    return build


# Encoder registry (--method strings, reference train_ddi_modify_eval2.py:331
# + the dev/refactored trainers' encoders, smiles_based_ddi.py).
ENCODERS = {
    "ggnn": _build_ggnn,
    "relgcn": _build_relgcn,
    "gin": _build_gin,
    "mpnn": _build_mpnn,
    "nfp": _build_nfp,
    "ggnn-dev": _build_ggnn_dev("gru"),
    "ggnn-dev-fuse": _build_ggnn_dev("fuse"),
    "ggnn-dev-gate": _build_ggnn_dev("gate"),
    "ggnn-dev-self-loop": _build_ggnn_dev("self_loop"),
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
