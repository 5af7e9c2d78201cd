"""Stage-by-stage wall timing of __graft_entry__.dryrun_multichip internals.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/time_dryrun.py [--no-cache]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
if "--cache" in sys.argv:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp
import optax

t0 = time.time()


def mark(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from codd_tpu.losses.assembly import LossConfig
from codd_tpu.models.codd import CODD
from codd_tpu.parallel.mesh import make_mesh, shard_batch
from codd_tpu.train.optim import make_optimizer
from codd_tpu.train.trainer import create_train_state, make_train_step

mark("imports done")

n_devices = 8
mesh = make_mesh(n_devices)
B, T, H, W = n_devices, 2, 64, 64
model = CODD(max_disp=32, iters=1)
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
mark("inputs built")

params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right, intr)
jax.block_until_ready(params)
mark("jit model.init done")

tx = make_optimizer(optax.constant_schedule(1e-4))
state = create_train_state(params, tx)
loss_cfg = LossConfig(max_disp=32, disp_range=(1.0, 210.0))
step = make_train_step(model, tx, loss_cfg, donate=False)
mark("state + step built")

with mesh:
    sharded = shard_batch(batch, mesh)
    new_state, logs = step(state, sharded)
    loss = float(logs["loss"])
mark(f"train step done, loss={loss:.4f}")
