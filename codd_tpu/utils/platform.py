"""Platform-selection helper for the CLIs.

The axon TPU plugin registers itself ahead of the ``JAX_PLATFORMS``
environment variable, so ``JAX_PLATFORMS=cpu python train.py ...`` would
silently land on the TPU.  ``jax.config.update("jax_platforms", ...)``
after import does win; the CLIs call this right after importing jax so
the documented CPU-verification recipe works.
"""

from __future__ import annotations

import os

__all__ = ["honor_platform_env"]


def honor_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want and "axon" not in want:
        import jax

        jax.config.update("jax_platforms", want)
