"""Training layer: typed config, loop, metrics, LR schedules, checkpoints."""

from gcnbmp_tpu.train.config import TrainConfig, PRESETS
from gcnbmp_tpu.train.metrics import binary_metrics, multilabel_metrics
from gcnbmp_tpu.train.loop import Trainer, make_train_step, make_eval_step

__all__ = [
    "TrainConfig",
    "PRESETS",
    "binary_metrics",
    "multilabel_metrics",
    "Trainer",
    "make_train_step",
    "make_eval_step",
]
