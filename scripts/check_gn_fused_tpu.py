"""ON-DEVICE equality gate for the fused GN solve kernel (gn_fused.py) —
the compiled Mosaic kernel vs the pure-XLA windowed oracle at the
production KITTI 1/8-res shape.

Mandatory before recording any bench number that exercises the kernel:
the r4 gn_window kernel passed interpret-mode equality and still
MISCOMPILED on chip (rel 7.8e-2, check_gn_pallas_tpu.py).

Usage: python scripts/check_gn_fused_tpu.py   (run SOLO on the chip)
Exit 0 = gate green.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops.pallas.gn_fused import (  # noqa: E402
    gn_fused_solve, gn_fused_solve_reference)

B, h, w, C = 1, 48, 160, 16
rng = np.random.RandomState(0)
ae = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32) * 0.5)
J = rng.randn(B, h, w, 3, 6).astype(np.float32)
Wt = rng.rand(B, h, w, 3).astype(np.float32)
M = np.einsum("...ki,...k,...kj->...ij", J, Wt, J)
idx = [(i, j) for i in range(6) for j in range(i, 6)]
Hp = np.stack([M[..., i, j] for i, j in idx], axis=-1)
bv = rng.randn(B, h, w, 6).astype(np.float32)
vals = jnp.asarray(np.concatenate([Hp, bv], axis=-1))

print(f"backend={jax.default_backend()}")
ok_all = True
for bf16 in (False, True):
    ref = np.asarray(gn_fused_solve_reference(ae, vals, bf16_scores=bf16))
    got = np.asarray(gn_fused_solve(ae, vals, bf16_scores=bf16))
    denom = np.abs(ref).max() + 1e-9
    rel = np.abs(got - ref).max() / denom
    tol = 2e-2 if bf16 else 1e-3
    ok = rel < tol
    ok_all &= ok
    print(f"bf16_scores={bf16}: max|d|={np.abs(got - ref).max():.6g} "
          f"rel={rel:.3e} tol={tol:g} -> {'OK' if ok else 'MISMATCH'}")
print("GATE GREEN" if ok_all else "GATE RED — do not bench this kernel")
sys.exit(0 if ok_all else 1)
