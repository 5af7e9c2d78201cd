"""ON-DEVICE equality gate for the fused tile-warp kernel
(ops/pallas/tile_warp.py) vs the exact tile_warping XLA path, at the
production full-res shape.  Also the Mosaic-support probe for the
in-kernel take_along_axis lane gather — a compile failure here means the
kernel design is off the table for this toolchain.

Usage: python scripts/check_tile_warp_tpu.py   (run SOLO on the chip)
Exit 0 = gate green.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops.pallas.tile_warp import (  # noqa: E402
    tile_warp_cost, tile_warp_cost_reference)

ok_all = True
print(f"backend={jax.default_backend()}")
for (B, H, W, C, max_d, label) in [
        (1, 384, 1280, 16, 320.0, "full-res (tile_update4)"),
        (1, 192, 640, 16, 160.0, "half-res (tile_update3)"),
        (1, 96, 320, 24, 80.0, "quarter-res (tile_update2)")]:
    rng = np.random.RandomState(0)
    fl = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fr = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ht, wt = H // 4, W // 4
    hyp3 = jnp.asarray(np.stack([
        rng.rand(B, ht, wt) * max_d,
        rng.uniform(-1.2, 1.2, (B, ht, wt)),
        rng.uniform(-1.2, 1.2, (B, ht, wt))], axis=-1).astype(np.float32))
    ref = np.asarray(tile_warp_cost_reference(hyp3, fl, fr))
    got = np.asarray(tile_warp_cost(hyp3, fl, fr))
    denom = np.abs(ref).max() + 1e-9
    rel = np.abs(got - ref).max() / denom
    ok = rel < 1e-4
    ok_all &= ok
    print(f"{label}: max|d|={np.abs(got - ref).max():.6g} rel={rel:.3e} "
          f"-> {'OK' if ok else 'MISMATCH'}")
print("GATE GREEN" if ok_all else "GATE RED — do not bench this kernel")
sys.exit(0 if ok_all else 1)
