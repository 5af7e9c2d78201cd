"""One cold dryrun trial under a given XLA flag set; prints stage marks.

Usage: python scripts/trial_dryrun_flags.py "<extra xla flags>"
(The script sets jax_platforms=cpu and 8 virtual devices itself; no
persistent cache, so every run is a cold compile.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

extra = sys.argv[1] if len(sys.argv) > 1 else ""
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + extra)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

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

mark(f"imports done; flags: {extra!r}")

stereo_only = "--stereo-only" in sys.argv
plain_sgd = "--plain-sgd" in sys.argv

n_devices = 8
B, T, H, W = n_devices, 2, 64, 64
kw = (dict(motion_type="none", fusion_type="none") if stereo_only else {})
model = CODD(max_disp=16, iters=1, **kw)
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

shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), left[:1],
                        right[:1], intr[:1])
synth = np.random.RandomState(1234)


def _mk(path, s):
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if not jnp.issubdtype(s.dtype, jnp.floating):
        return jnp.zeros(s.shape, s.dtype)
    if name in ("scale", "var"):
        return jnp.ones(s.shape, s.dtype)
    if name in ("bias", "mean") or s.ndim <= 1:
        return jnp.zeros(s.shape, s.dtype)
    fan_in = int(np.prod(s.shape[:-1]))
    return jnp.asarray(
        (synth.randn(*s.shape) / np.sqrt(max(fan_in, 1))).astype(s.dtype))


params = jax.tree_util.tree_map_with_path(_mk, shapes)
mark("synth params")
if plain_sgd:
    tx = optax.sgd(1e-4)
else:
    tx = make_optimizer(optax.constant_schedule(1e-4))
state = create_train_state(params, tx)
loss_cfg = LossConfig(max_disp=16, disp_range=(1.0, 210.0),
                      motion=not stereo_only, fusion=not stereo_only)
step = make_train_step(model, tx, loss_cfg, donate=False)

mesh = make_mesh(n_devices)
with mesh:
    sharded = shard_batch(batch, mesh)
    mark("sharded")
    lowered = step.lower(state, sharded)
    mark("lowered")
    compiled = lowered.compile()
    mark("compiled")
    new_state, logs = compiled(state, sharded)
    loss = float(logs["loss"])
    mark(f"executed: loss={loss:.4f} gnorm={float(logs['grad_norm']):.4f}")
