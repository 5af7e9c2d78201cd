"""Train-step compile-time bisect on the remote helper (r5; the full
train module has timed out at 50-60 min on 4 dated attempts since r4
while bench-sized inference modules compile in 8-9 min the same hour).

Compiles make_train_step for one cascade stage per invocation — run each
stage as its OWN process under its own bash timeout, serialized:

    python scripts/compile_bisect_train.py stereo   # motion/fusion none
    python scripts/compile_bisect_train.py motion   # + RAFT3D/splat
    python scripts/compile_bisect_train.py full     # + fusion

The stage whose compile wall-time explodes vs its predecessor is the
compile bomb.  Prints compile+first-step seconds and one timed step.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from codd_tpu.utils.platform import honor_platform_env  # noqa: E402

honor_platform_env()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.codd import CODD  # noqa: E402
from codd_tpu.losses.assembly import LossConfig  # noqa: E402
from codd_tpu.train.optim import make_optimizer  # noqa: E402
from codd_tpu.train.trainer import (create_train_state,  # noqa: E402
                                    make_train_step)

import os

H = int(os.environ.get("BISECT_H", 256))
W = int(os.environ.get("BISECT_W", 512))
T, B = 2, 1
STAGES = {
    "stereo": dict(motion_type="none", fusion_type="none"),
    "motion": dict(motion_type="Motion", fusion_type="none"),
    "full": dict(),
}
stage = sys.argv[1] if len(sys.argv) > 1 else "full"
extra = {}
if "--window-splat" in sys.argv:
    extra["splat_impl_train"] = "xla_sort_window"
model = CODD(max_disp=320, iters=16, init_cost_variant="map",
             **STAGES[stage], **extra)
lc = LossConfig(max_disp=320)
print(f"stage={stage} {extra} backend={jax.default_backend()}", flush=True)

rng = np.random.RandomState(0)
batch = {
    "l_img": jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32)),
    "r_img": jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32)),
    "gt_disp": jnp.asarray(
        (rng.rand(B, T, H, W, 1) * 60 + 2).astype(np.float32)),
    "gt_flow": jnp.asarray(
        rng.uniform(-3, 3, (B, T, H, W, 2)).astype(np.float32)),
    "gt_disp_change": jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, T, H, W, 1)).astype(np.float32)),
    "intrinsics": jnp.asarray([[450.0, 450.0, W / 2, H / 2]] * B,
                              jnp.float32),
}
t0 = time.time()
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             batch["l_img"][:1, :, :64, :128],
                             batch["r_img"][:1, :, :64, :128],
                             batch["intrinsics"][:1])
print(f"init {time.time()-t0:.0f}s", flush=True)
tx = make_optimizer(lambda s: 1e-4, 1.0, params=params, frozen_prefixes=[])
state = create_train_state(params, tx)
step = make_train_step(model, tx, lc, donate=True, bf16_compute=False)
t0 = time.time()
state, logs = step(state, batch)
l0 = float(logs["loss"])
print(f"stage={stage}: compile+first {time.time()-t0:.0f}s loss={l0:.2f}",
      flush=True)
t0 = time.perf_counter()
state, logs = step(state, batch)
_ = float(logs["loss"])
print(f"stage={stage}: step {time.perf_counter()-t0:.2f}s", flush=True)
