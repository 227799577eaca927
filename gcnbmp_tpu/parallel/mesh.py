"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """A (data, model) mesh over the first ``n_devices`` devices.

    ``model_parallel`` splits the model axis; the rest is data parallel.
    On a pod slice the data axis should map to the slower (DCN/outer ICI)
    dimension and model to the faster inner ICI ring — jax's default
    device order for TPU already enumerates ICI-adjacent chips
    contiguously, so a simple reshape is the right layout.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
