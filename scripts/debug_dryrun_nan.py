"""Locate the non-finite loss in the multichip dryrun's synthesized-params
path (VERDICT r3 task #1).  Runs the full fwd+loss eagerly on CPU at the
dryrun shapes with host-synthesized params and prints every loss term.

Usage: JAX_PLATFORMS=cpu python scripts/debug_dryrun_nan.py [flat|fanin]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from codd_tpu.losses.assembly import LossConfig, codd_train_loss
from codd_tpu.models.codd import CODD

scheme = sys.argv[1] if len(sys.argv) > 1 else "fanin"
t0 = time.time()


def mark(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


B, T, H, W = 1, 2, 64, 64
model = CODD(max_disp=16, iters=1)
rng = np.random.RandomState(0)
left = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
intr = jnp.asarray([[450.0, 450.0, W / 2.0, H / 2.0]] * B, jnp.float32)
rng2 = np.random.RandomState(1)
batch = {
    "l_img": left,
    "r_img": right,
    "intrinsics": intr,
    "gt_disp": jnp.asarray(rng2.uniform(1, 30, (B, T, H, W, 1)).astype(np.float32)),
    "gt_flow": jnp.asarray(rng2.uniform(-2, 2, (B, T, H, W, 2)).astype(np.float32)),
    "gt_disp_change": jnp.asarray(rng2.uniform(-1, 1, (B, T, H, W, 1)).astype(np.float32)),
}

shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), left, right, intr)
synth = np.random.RandomState(1234)


def _mk_flat(path, s):
    if jnp.issubdtype(s.dtype, jnp.floating):
        return jnp.asarray((synth.randn(*s.shape) * 0.02).astype(s.dtype))
    return jnp.zeros(s.shape, s.dtype)


def _mk_fanin(path, s):
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if not jnp.issubdtype(s.dtype, jnp.floating):
        return jnp.zeros(s.shape, s.dtype)
    # batch_stats var / norm scale start at 1 (var=0 would turn every
    # BN into a ~1/sqrt(eps) amplifier — the dryrun nan culprit)
    if name in ("scale", "var"):
        return jnp.ones(s.shape, s.dtype)
    if name in ("bias", "mean") or s.ndim <= 1:
        return jnp.zeros(s.shape, s.dtype)
    # kernel: lecun-normal (flax default): std = 1/sqrt(fan_in)
    fan_in = int(np.prod(s.shape[:-1]))
    std = 1.0 / np.sqrt(max(fan_in, 1))
    return jnp.asarray((synth.randn(*s.shape) * std).astype(s.dtype))


mk = {"flat": _mk_flat, "fanin": _mk_fanin}[scheme]
params = jax.tree_util.tree_map_with_path(mk, shapes)
mark(f"synth params ({scheme})")

gt_seq = {k: v for k, v in batch.items() if k.startswith("gt_")}
outs = model.apply(params, batch["l_img"], batch["r_img"],
                   batch["intrinsics"], train=True, gt_seq=gt_seq)
mark("forward done")

# scan outputs for non-finite tensors
for t, out in enumerate(outs):
    for k, v in out.items():
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            arr = np.asarray(v)
            if not np.isfinite(arr).all():
                frac = 1 - np.isfinite(arr).mean()
                print(f"  NONFINITE out[t={t}][{k}] shape={arr.shape} "
                      f"frac={frac:.4f}")

loss_cfg = LossConfig(max_disp=16, disp_range=(1.0, 210.0))
loss, logs = codd_train_loss(loss_cfg, outs, batch)
mark(f"loss={float(loss):.4f}")
for k in sorted(logs):
    v = logs[k]
    if hasattr(v, "dtype"):
        print(f"  {k:30s} {float(v):.6f}")
