"""On-device equality check: gn_window_aggregate (Mosaic) vs the XLA
windowed aggregation, at the production KITTI shape.

The interpret-mode CPU test (tests/test_ops_gn.py) passes, but the 64-iter
probe (probe_gn_scores.py) converges to different values for the two impls
on the real chip (-182.3 vs -264.7, 2026-08-19) — this isolates whether the
compiled kernel itself diverges.

Usage: python scripts/check_gn_pallas_tpu.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops import gn  # noqa: E402
from codd_tpu.ops.pallas.gn_window import gn_window_aggregate  # noqa: E402

B, h, w, C = 1, 48, 160, 16
rng = np.random.RandomState(0)
ae = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
vals = jnp.asarray(rng.randn(B, h, w, 27).astype(np.float32) * 10)

ref = np.asarray(jax.jit(lambda a, v: gn._windowed_aggregate(a, v, radius=32))(ae, vals))
got = np.asarray(jax.jit(lambda a, v: gn_window_aggregate(a, v, radius=32))(ae, vals))

adiff = np.abs(got - ref)
denom = np.abs(ref).max() + 1e-9
print(f"backend={jax.default_backend()}")
print(f"max|d|={adiff.max():.6g}  rel={adiff.max()/denom:.3e}  "
      f"argmax={np.unravel_index(adiff.argmax(), adiff.shape)}")
print(f"ref[0,0,0,:3]={ref[0,0,0,:3]}")
print(f"got[0,0,0,:3]={got[0,0,0,:3]}")
ok = adiff.max() / denom < 1e-3
print("OK" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
