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
