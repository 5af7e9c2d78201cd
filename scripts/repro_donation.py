"""Minimal repro for the buffer-donation corruption (trainer.py note).

Round-2 bisect: jitting the full train step with donate_argnums=(0,) on
the axon/XLA:TPU stack reads NaN loss/grads from step 0; the identical
program without donation is finite.  This script reproduces at the
smallest config that showed it (full CODD cascade, tiny shapes) and also
probes the *eval carry* donation (bench-style step) separately, so
donation can be re-enabled wherever it is finite.

Usage: python scripts/repro_donation.py [--train] [--carry]
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


def repro_train():
    H, W, B, T = 64, 128, 1, 2
    rng = np.random.RandomState(0)
    model = CODD(max_disp=64, iters=2)
    batch = {
        "l_img": jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32)),
        "r_img": jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32)),
        "gt_disp": jnp.asarray(
            (rng.rand(B, T, H, W, 1) * 30 + 2).astype(np.float32)),
        "gt_flow": jnp.asarray(
            rng.uniform(-2, 2, (B, T, H, W, 2)).astype(np.float32)),
        "gt_disp_change": jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, T, H, W, 1)).astype(np.float32)),
        "intrinsics": jnp.asarray([[450.0, 450.0, W / 2, H / 2]] * B,
                                  jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["l_img"],
                                 batch["r_img"], batch["intrinsics"])
    lc = LossConfig(max_disp=64)
    for donate in (False, True):
        tx = make_optimizer(lambda s: 1e-4, 1.0, params=params,
                            frozen_prefixes=[])
        state = create_train_state(params, tx)
        step = make_train_step(model, tx, lc, donate=donate)
        losses = []
        for i in range(3):
            state, logs = step(state, batch)
            losses.append(float(logs["loss"]))
        ok = all(np.isfinite(l) for l in losses)
        print(f"train donate={donate}: losses={[f'{l:.2f}' for l in losses]} "
              f"{'FINITE' if ok else 'NON-FINITE (repro)'}", flush=True)


def repro_carry():
    H, W = 384, 1280
    rng = np.random.RandomState(0)
    model = CODD(max_disp=320, iters=16)
    l0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    r0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    l1 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    r1 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    intr = jnp.asarray([[450.0, 450.0, W / 2, H / 2]], jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128, 3)),
        jnp.zeros((1, 2, 64, 128, 3)),
        jnp.asarray([[450.0, 450.0, 64.0, 32.0]], jnp.float32))
    first = jax.jit(lambda p, l, r, k: model.apply(p, l, r, k,
                                                   method=CODD.first_step))

    for donate in (False, True):
        step = jax.jit(
            lambda p, c, l, r, k: model.apply(p, c, l, r, k,
                                              method=CODD.step),
            donate_argnums=(1,) if donate else ())
        carry, _ = first(params, l0, r0, intr)
        ds = []
        t0 = time.perf_counter()
        for i in range(6):
            carry, out = step(params, carry, l1 if i % 2 else l0,
                              r1 if i % 2 else r0, intr)
            ds.append(float(np.asarray(out["pred_disp"][0, 0, 0, 0])))
        dt = (time.perf_counter() - t0) / 6
        ok = all(np.isfinite(d) for d in ds)
        print(f"carry donate={donate}: {dt*1e3:.1f} ms/frame "
              f"disp[0,0]={[f'{d:.3f}' for d in ds]} "
              f"{'FINITE' if ok else 'NON-FINITE (repro)'}", flush=True)


if __name__ == "__main__":
    if "--carry" in sys.argv or len(sys.argv) == 1:
        repro_carry()
    if "--train" in sys.argv or len(sys.argv) == 1:
        repro_train()
