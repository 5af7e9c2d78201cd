"""Training-step throughput at recipe scale (VERDICT round-1 item 6):
full CODD fwd+bwd+Adam on synthetic batches, B x 256x512 T=2, 16 GN
iters.  Prints it/s per config.  Run SOLO on the real chip.

Usage: python scripts/probe_train.py [B ...] [--bf16]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.codd import CODD  # noqa: E402
from codd_tpu.losses.assembly import LossConfig  # noqa: E402
from codd_tpu.train.optim import make_optimizer  # noqa: E402
from codd_tpu.train.trainer import (create_train_state,  # noqa: E402
                                    make_train_step)

H, W, T = 256, 512, 2
bf16 = "--bf16" in sys.argv
sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 4]

rng = np.random.RandomState(0)
# init_cost_variant="map": the unrolled variant's 620 strided slices (+
# backward) make a train-step module the remote compile helper could not
# finish in 50 min (2026-08-19, rc=124); the lax.map form compiles in
# minutes and is a supported config (models/codd.py runtime section).
INIT_COST = "unrolled" if "--unrolled-init" in sys.argv else "map"
# --window-splat: the shifted-window differentiable splat
# (ops/splat_window.splat_one_sort_window) replaces the segmented-scan +
# 21-pass-cumsum train path — much smaller train-step HLO, the prime
# suspect in the 50-min compile-helper timeouts (r4 queue D, r5 queue A)
SPLAT_TRAIN = ("xla_sort_window" if "--window-splat" in sys.argv else "xla")
model = CODD(max_disp=320, iters=16, init_cost_variant=INIT_COST,
             splat_impl_train=SPLAT_TRAIN)
lc = LossConfig(max_disp=320)
print(f"config: {H}x{W} T={T} iters=16 max_disp=320 "
      f"init_cost={INIT_COST} splat_train={SPLAT_TRAIN} "
      f"bf16_compute={bf16}", flush=True)


def batch_for(B):
    return {
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


for B in sizes:
    batch = batch_for(B)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 batch["l_img"][:1, :, :64, :128],
                                 batch["r_img"][:1, :, :64, :128],
                                 batch["intrinsics"][:1])
    tx = make_optimizer(lambda s: 1e-4, 1.0, params=params,
                        frozen_prefixes=[])
    state = create_train_state(params, tx)
    # donate=True: the sweep measures the production configuration — the
    # training loop owns & donates its TrainState (apis/train.py)
    step = make_train_step(model, tx, lc, donate=True, bf16_compute=bf16)
    t0 = time.time()
    state, logs = step(state, batch)
    l0 = float(logs["loss"])
    print(f"B={B} {'bf16' if bf16 else 'f32'}: compile+first "
          f"{time.time()-t0:.0f}s loss={l0:.1f}", flush=True)
    N = 6
    t0 = time.perf_counter()
    for _ in range(N):
        state, logs = step(state, batch)
    lN = float(logs["loss"])  # hard sync
    dt = time.perf_counter() - t0
    stats = jax.local_devices()[0].memory_stats() or {}
    peak_gb = stats.get("peak_bytes_in_use", 0) / 2**30
    print(f"B={B} {'bf16' if bf16 else 'f32'}: {N/dt:.3f} it/s "
          f"({dt/N*1e3:.0f} ms/step, {B*N/dt:.2f} samples/s) "
          f"loss {l0:.1f}->{lN:.1f} peak_hbm={peak_gb:.2f}GiB", flush=True)
