"""Test harness: force an 8-device virtual CPU mesh.

The driver environment exports ``JAX_PLATFORMS=axon`` (real TPU via a
tunnel) and the axon plugin re-asserts itself at import time, so setting
the env var alone is not enough — we must also update the jax config
before any backend is initialized.  All tests then run on 8 virtual CPU
devices, hermetically and fast.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated suite runs skip XLA recompilation
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402

# Two-tier suite: the multi-process, end-to-end, and golden-parity tests
# dominate the 45-min full-suite wall time on a 1-core host.  Mark them
# `slow` by module so `pytest -m "not slow"` is a <5-min op-oracle tier.
_SLOW_MODULES = (
    "test_multihost",
    "test_multihost_train",
    "test_e2e_train_infer",
    "test_codd_estimator",
    "test_trainer_accum",
    "test_evaluation",
    "test_imgdir_mode",
    "tests/parity/",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        path = str(getattr(item, "path", item.fspath))
        if any(m in path for m in _SLOW_MODULES):
            item.add_marker(pytest.mark.slow)
