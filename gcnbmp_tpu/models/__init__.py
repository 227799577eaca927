"""Model layer: encoders, co-attention, heads, pair predictor."""

from gcnbmp_tpu.models.ggnn import GGNN, GatedReadout, GGNNUpdate
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

# Encoder registry (--method strings, reference train_ddi_modify_eval2.py:331).
ENCODERS = {
    "ggnn": GGNN,
}

__all__ = [
    "GGNN",
    "GatedReadout",
    "GGNNUpdate",
    "HEADS",
    "ENCODERS",
    "CosineHead",
    "DistMultHead",
    "HolEHead",
    "MLPHead",
    "NTNHead",
    "SymMLPHead",
    "PairPredictor",
    "set_up_predictor",
]
