"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (SURVEY §4d).

The container environment pins JAX_PLATFORMS=axon (a tunnel to one real
TPU chip) and a sitecustomize imports jax at interpreter start, binding
that env var into jax.config before this file runs.  So the override must
go through jax.config.update, not os.environ.  Set GCNBMP_TEST_TPU=1 to
run the suite against the real chip instead.
"""

import os

# XLA reads XLA_FLAGS when the CPU backend is created (lazily, after this
# file runs), so the virtual-device-count flag can still go via env.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("GCNBMP_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2018)


# ---- suite tiers (VERDICT r4 weak #7): `pytest -m smoke` is the <5-min
# fast tier covering every layer (chem, packing, kernels, models,
# co-attention, eval, CLIs end-to-end via test_real_data_compat, plus a
# couple of quick multi-device checks); `-m "not slow"` drops only the
# long 8-vdev grad-parity batteries.  Durations measured 2026-08-21
# (full suite 34 min; test_parallel.py alone 22.6 min).

SMOKE_FILES = {
    "test_smiles.py", "test_featurize.py", "test_splits.py",
    "test_synth_dataset.py", "test_native.py", "test_native_pack.py",
    "test_models.py", "test_encoders.py", "test_coattention.py",
    "test_packing.py", "test_slotgather.py", "test_eval.py",
    "test_losses_multilabel.py", "test_fixed_embeddings.py",
    "test_prefetch.py", "test_rdkit_crosscheck.py",
    "test_real_data_compat.py",
}

SMOKE_TESTS = {
    "test_parallel.py::test_pairlocal_packer_device_locality",
    "test_parallel.py::test_dp_tp_sharded_step_matches_single_device",
}

SLOW_TESTS = {  # >60s each on this VM
    "test_edgeshard_gwm_matches_single_device",
    "test_edgeshard_coattn_matches_single_device",
    "test_edgeshard_coattn_pairlocal_matches_single_device",
    "test_edgeshard_coo_bf16_matches_single_device",
    "test_edgeshard_loss_matches_single_device",
    "test_edgeshard_coo_loss_matches_single_device",
    "test_edgeshard_focal_and_hinge_losses_match_single_device",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if fname in SMOKE_FILES or f"{fname}::{base}" in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
