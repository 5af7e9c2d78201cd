"""Bisect the XLA:CPU compile cost of the multi-chip dryrun train step.

Each invocation compiles ONE configuration (so a timeout kills only that
stage); a driver loop in bash walks the configurations.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bisect_dryrun_compile.py <stage>

stages: init-eager | init-jit | step-stereo | step-stereo-motion | step-full
        | fwd-full
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

stage = sys.argv[1]
t0 = time.time()


def mark(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


n_devices = 8
B, T, H, W = n_devices, 2, 64, 64
rng = np.random.RandomState(0)
left = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
intr = jnp.asarray([[450.0, 450.0, W / 2.0, H / 2.0]] * B, jnp.float32)
batch = {
    "l_img": left,
    "r_img": right,
    "intrinsics": intr,
    "gt_disp": jnp.asarray(rng.uniform(1, 30, (B, T, H, W, 1)).astype(np.float32)),
    "gt_flow": jnp.asarray(rng.uniform(-2, 2, (B, T, H, W, 2)).astype(np.float32)),
    "gt_disp_change": jnp.asarray(
        rng.uniform(-1, 1, (B, T, H, W, 1)).astype(np.float32)),
}

if stage == "init-eager":
    model = CODD(max_disp=16, iters=1)
    params = model.init(jax.random.PRNGKey(0), left[:1], right[:1], intr[:1])
    jax.block_until_ready(params)
    mark("eager init (B=1) done")
    sys.exit(0)

if stage == "init-jit":
    model = CODD(max_disp=16, iters=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right, intr)
    jax.block_until_ready(params)
    mark("jit init (B=8) done")
    sys.exit(0)

cfgs = {
    "step-stereo": dict(motion_type="none", fusion_type="none"),
    "step-stereo-motion": dict(motion_type="Motion", fusion_type="none"),
    "step-full": dict(motion_type="Motion", fusion_type="Fusion"),
    "fwd-full": dict(motion_type="Motion", fusion_type="Fusion"),
}
kw = cfgs[stage]
model = CODD(max_disp=16, iters=1, **kw)
params = model.init(jax.random.PRNGKey(0), left[:1], right[:1], intr[:1])
mark("eager init done")

mesh = make_mesh(n_devices)
loss_cfg = LossConfig(max_disp=16, disp_range=(1.0, 210.0),
                      motion=kw["motion_type"] == "Motion",
                      fusion=kw["fusion_type"] == "Fusion")

if stage == "fwd-full":
    fwd = jax.jit(lambda p, l, r, i: model.apply(
        p, l, r, i, train=True,
        gt_seq={k: v for k, v in batch.items() if k.startswith("gt_")}
    )[-1]["pred_disp"])
    with mesh:
        sharded = shard_batch(batch, mesh)
        out = fwd(params, sharded["l_img"], sharded["r_img"],
                  sharded["intrinsics"])
        jax.block_until_ready(out)
    mark("fwd-full (no grad) done")
    sys.exit(0)

tx = make_optimizer(optax.constant_schedule(1e-4))
state = create_train_state(params, tx)
step = make_train_step(model, tx, loss_cfg, donate=False)
with mesh:
    sharded = shard_batch(batch, mesh)
    new_state, logs = step(state, sharded)
    loss = float(logs["loss"])
mark(f"{stage} done, loss={loss:.4f}")
