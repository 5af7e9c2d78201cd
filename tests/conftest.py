"""Test harness: force an 8-device virtual CPU mesh before jax import.

All tests run on CPU so they are hermetic on any host; multi-device tests
use the forced host platform device count (cf. driver dryrun contract).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
