"""Learning-rate schedules.

- ``exponential_shift_schedule``: the reference's manual ExponentialShift
  epoch lists (train_ddi_modify_eval2.py:675-687) — lr multiplied by
  ``rate`` at each listed epoch boundary.
- ``cyclical_schedule``: CLR triangular / triangular2 / exp_range
  (reference: clr.py:37-109).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def exponential_shift_schedule(
    base_lr: float,
    shift_epochs: Sequence[int],
    steps_per_epoch: int,
    rate: float = 0.5,
) -> Callable:
    boundaries = jnp.asarray(
        [e * steps_per_epoch for e in sorted(shift_epochs)], dtype=jnp.int32
    )

    def schedule(step):
        n_shifts = jnp.sum(step >= boundaries)
        return base_lr * (rate ** n_shifts)

    return schedule


def cyclical_schedule(
    base_lr: float,
    max_lr: float,
    step_size: int,
    mode: str = "triangular",
    gamma: float = 0.99994,
) -> Callable:
    """CLR (Smith 2017) as used by the reference's trainer extension
    (clr.py:37-109): lr oscillates between base_lr and max_lr with
    half-cycle ``step_size`` iterations."""

    def schedule(step):
        cycle = jnp.floor(1 + step / (2.0 * step_size))
        x = jnp.abs(step / float(step_size) - 2 * cycle + 1)
        scale = jnp.maximum(0.0, 1.0 - x)
        if mode == "triangular":
            amp = 1.0
        elif mode == "triangular2":
            amp = 1.0 / (2.0 ** (cycle - 1))
        elif mode == "exp_range":
            amp = gamma ** step
        else:
            raise ValueError(f"unknown CLR mode {mode!r}")
        return base_lr + (max_lr - base_lr) * scale * amp

    return schedule
