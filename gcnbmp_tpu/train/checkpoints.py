"""Checkpoint save/restore.

Replaces the reference's three Chainer serializer mechanisms (SURVEY §5.4:
trainer snapshots via save/load_npz, final model pickle, eval-time
snapshot overlay) with orbax pytree checkpoints of
{params, opt_state, step/epoch bookkeeping}; a msgpack fallback keeps the
format dependency-light.
"""

from __future__ import annotations

import os
import jax
import numpy as np
from flax import serialization

from gcnbmp_tpu.train.loop import TrainState

try:
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    ocp = None
    HAVE_ORBAX = False


def _state_to_tree(state: TrainState) -> dict:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "meta": {
            "step": np.asarray(state.step),
            "epoch": np.asarray(state.epoch),
            "best_val_loss": np.asarray(state.best_val_loss),
            "epochs_since_best": np.asarray(state.epochs_since_best),
        },
    }


def _tree_to_state(tree: dict, template: TrainState) -> TrainState:
    meta = tree["meta"]
    return TrainState(
        params=tree["params"],
        opt_state=tree["opt_state"],
        step=int(meta["step"]),
        epoch=int(meta["epoch"]),
        best_val_loss=float(meta["best_val_loss"]),
        epochs_since_best=int(meta["epochs_since_best"]),
    )


def save_checkpoint(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    tree = jax.device_get(_state_to_tree(state))
    if HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
    else:  # pragma: no cover
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(tree))


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    if HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(path, item=jax.device_get(_state_to_tree(template)))
    else:  # pragma: no cover
        # msgpack restore against the template's structure — no arbitrary
        # code execution on load (unlike the reference's Classifier pickle,
        # eval_coattention.py:430-431).
        if (not os.path.exists(path + ".msgpack")
                and os.path.exists(path + ".pkl")):
            raise RuntimeError(
                f"{path}.pkl is a legacy pickle-fallback checkpoint; the "
                "fallback format is now flax msgpack (no code execution "
                "on restore). Re-save the checkpoint from the run that "
                "produced it, or load it manually with pickle at your "
                "own risk."
            )
        with open(path + ".msgpack", "rb") as f:
            tree = serialization.from_bytes(
                jax.device_get(_state_to_tree(template)), f.read()
            )
    return _tree_to_state(tree, template)
