"""Co-attention family over drug-pair atom representations.

Reference modules under models/coattention/ selected by --attn
(train_binary.py:190-259): alter, para, circ, vqa, pool, lt, nie, deep,
very-deep, extreme-deep, fourier, bimpm (+ global, dual-global, neural
from eval3).  Implementations land incrementally; registry below is the
single dispatch point.
"""

from __future__ import annotations

from typing import Dict, Optional, Type

from flax import linen as nn

COATTENTION_REGISTRY: Dict[str, Type[nn.Module]] = {}


def register(name: str):
    def deco(cls):
        COATTENTION_REGISTRY[name] = cls
        return cls

    return deco


def build_coattention(name: str, hidden_dim: int, out_dim: int) -> nn.Module:
    if name not in COATTENTION_REGISTRY:
        raise NotImplementedError(
            f"co-attention {name!r} not yet implemented; available: "
            f"{sorted(COATTENTION_REGISTRY)}"
        )
    return COATTENTION_REGISTRY[name](
        hidden_dim=hidden_dim, out_dim=out_dim, name=f"coattn_{name}"
    )
