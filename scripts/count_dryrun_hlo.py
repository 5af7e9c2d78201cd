"""Trace (not compile) the multichip dryrun step and count StableHLO ops.

XLA:CPU at -O0 spends compile time roughly per-op; this attributes the
module's op count by op type and by source location to find what to
shrink.  Trace-only: ~60 s, no 6-minute compile.

Usage: python scripts/count_dryrun_hlo.py
"""
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax

from codd_tpu.losses.assembly import LossConfig
from codd_tpu.models.codd import CODD
from codd_tpu.parallel.mesh import make_mesh, shard_batch
from codd_tpu.train.optim import make_optimizer
from codd_tpu.train.trainer import create_train_state, make_train_step

t0 = time.time()
n_devices = 8
B, T, H, W = n_devices, 2, 64, 64
model = CODD(max_disp=16, iters=1)
rng = np.random.RandomState(0)
left = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
intr = jnp.asarray([[450.0, 450.0, W / 2.0, H / 2.0]] * B, jnp.float32)
rng2 = np.random.RandomState(1)
batch = {
    "l_img": left, "r_img": right, "intrinsics": intr,
    "gt_disp": jnp.asarray(rng2.uniform(1, 30, (B, T, H, W, 1)).astype(np.float32)),
    "gt_flow": jnp.asarray(rng2.uniform(-2, 2, (B, T, H, W, 2)).astype(np.float32)),
    "gt_disp_change": jnp.asarray(rng2.uniform(-1, 1, (B, T, H, W, 1)).astype(np.float32)),
}

shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), left[:1], right[:1], intr[:1])
params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
tx = make_optimizer(optax.constant_schedule(1e-4))
state = create_train_state(params, tx)
loss_cfg = LossConfig(max_disp=16, disp_range=(1.0, 210.0))
step = make_train_step(model, tx, loss_cfg, donate=False)

mesh = make_mesh(n_devices)
with mesh:
    sharded = shard_batch(batch, mesh)
    lowered = step.lower(state, sharded)
print(f"[{time.time()-t0:.1f}s] lowered")

txt = lowered.as_text()
print(f"module text: {len(txt)/1e6:.1f} MB, {txt.count(chr(10))} lines")

op_counts = collections.Counter()
loc_counts = collections.Counter()
loc_re = re.compile(r'loc\("([^"]*)"')
for line in txt.splitlines():
    m = re.search(r"= (?:stablehlo|mhlo|chlo)\.([a-z_0-9]+)", line)
    if not m:
        m = re.search(r'= "(?:stablehlo|mhlo)\.([a-z_0-9]+)"', line)
    if m:
        op_counts[m.group(1)] += 1
        lm = loc_re.search(line)
        if lm:
            # keep the leading jax scope path (module attribution)
            scope = lm.group(1).split("(")[-1]
            parts = scope.split("/")
            loc_counts["/".join(parts[:3])] += 1

print(f"\ntotal ops: {sum(op_counts.values())}")
print("\n== by op type ==")
for k, v in op_counts.most_common(25):
    print(f"{v:7d}  {k}")
print("\n== by source scope (top 40) ==")
for k, v in loc_counts.most_common(40):
    print(f"{v:7d}  {k}")
