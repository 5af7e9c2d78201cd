"""bf16 end-to-end inference validation (VERDICT r2 task 3).

Protocol: train the stereo net briefly on synthetic stereo video (the
fixture BENCH_NOTES' round-1 learning-sanity run used), transplant the
trained stereo params into the full CODD cascade (motion/fusion keep
golden-ported random init — no reference checkpoints are reachable
offline), then stream a 50-frame synthetic sequence twice — f32 params vs
bf16 params/inputs — and report disparity EPE against GT plus the direct
f32-vs-bf16 disparity delta.

Decision rule (VERDICT): if the disparity delta is < 0.05 px, bf16
becomes the bench default.

Usage: python scripts/validate_bf16.py [--train-steps N] [--frames K]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gen_synth_train import _disp_field, _texture, _warp_right  # noqa: E402

from codd_tpu.models.codd import CODD  # noqa: E402
from codd_tpu.losses.assembly import LossConfig  # noqa: E402
from codd_tpu.train.optim import make_optimizer  # noqa: E402
from codd_tpu.train.trainer import create_train_state, make_train_step  # noqa: E402
from codd_tpu.utils.precision import cast_floats  # noqa: E402

H, W = 320, 576


def synth_sequence(rng, frames):
    """Camera-pan sequence: texture shifts 2 px/frame, static disparity."""
    base = _texture(rng, H, W + 2 * frames)
    disp = _disp_field(rng, H, W)
    lefts, rights = [], []
    for t in range(frames):
        left = base[:, 2 * t:2 * t + W]
        lefts.append(left)
        rights.append(_warp_right(left, disp))
    return (np.stack(lefts), np.stack(rights), disp)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-steps", type=int, default=400)
    p.add_argument("--frames", type=int, default=50)
    args = p.parse_args()

    rng = np.random.RandomState(7)
    intr = jnp.asarray([[450.0, 450.0, W / 2.0, H / 2.0]], jnp.float32)

    # ---- 1. train stereo-only on synthetic crops ----
    model_s = CODD(max_disp=320, iters=1, motion_type="none",
                   fusion_type="none")
    params = jax.jit(model_s.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128, 3)),
        jnp.zeros((1, 2, 64, 128, 3)),
        jnp.asarray([[450.0, 450.0, 64.0, 32.0]], jnp.float32))
    tx = make_optimizer(lambda s: 4e-4, 1.0, params=params,
                        frozen_prefixes=[])
    state = create_train_state(params, tx)
    step = make_train_step(model_s, tx, LossConfig(max_disp=320))

    def crop_batch(B=2, ch=256, cw=512):
        ls, rs, ds = [], [], []
        for _ in range(B):
            lf, rt, dp = synth_sequence(rng, 2)
            y = rng.randint(0, H - ch + 1)
            x = rng.randint(0, W - cw + 1)
            ls.append(lf[:, y:y + ch, x:x + cw])
            rs.append(rt[:, y:y + ch, x:x + cw])
            ds.append(np.stack([dp[y:y + ch, x:x + cw]] * 2))
        return {
            "l_img": jnp.asarray(np.stack(ls)),
            "r_img": jnp.asarray(np.stack(rs)),
            "gt_disp": jnp.asarray(np.stack(ds))[..., None],
            "intrinsics": jnp.asarray([[450.0, 450.0, cw / 2, ch / 2]] * B,
                                      jnp.float32),
        }

    t0 = time.time()
    for i in range(args.train_steps):
        state, logs = step(state, crop_batch())
        if i % 50 == 0 or i == args.train_steps - 1:
            print(f"train step {i}: loss={float(logs['loss']):.2f} "
                  f"epe1={float(logs.get('epe1', jnp.nan)):.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    trained_stereo = jax.device_get(state.params["params"]["stereo"])

    # ---- 2. transplant into the full cascade ----
    model = CODD(max_disp=320, iters=16)
    params_full = jax.jit(model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, 64, 128, 3)),
        jnp.zeros((1, 2, 64, 128, 3)),
        jnp.asarray([[450.0, 450.0, 64.0, 32.0]], jnp.float32))
    params_full = jax.device_get(params_full)
    params_full["params"]["stereo"] = trained_stereo
    params_full = jax.device_put(params_full)

    first = jax.jit(lambda p, l, r, k: model.apply(p, l, r, k,
                                                   method=CODD.first_step))
    stepf = jax.jit(lambda p, c, l, r, k: model.apply(p, c, l, r, k,
                                                      method=CODD.step))

    lf, rt, dp = synth_sequence(np.random.RandomState(99), args.frames)
    lseq = jnp.asarray(lf)[None]  # (1, T, H, W, 3)
    rseq = jnp.asarray(rt)[None]
    valid = (dp > 1.0) & (dp < 210.0)

    def stream(params, cast):
        pl = cast_floats(params) if cast else params
        disps = []
        l0 = lseq[:, 0].astype(jnp.bfloat16) if cast else lseq[:, 0]
        r0 = rseq[:, 0].astype(jnp.bfloat16) if cast else rseq[:, 0]
        carry, out = first(pl, l0, r0, intr)
        disps.append(np.asarray(out["pred_disp"][0, :, :, 0], np.float32))
        for t in range(1, args.frames):
            lt = lseq[:, t].astype(jnp.bfloat16) if cast else lseq[:, t]
            rt_ = rseq[:, t].astype(jnp.bfloat16) if cast else rseq[:, t]
            carry, out = stepf(pl, carry, lt, rt_, intr)
            disps.append(np.asarray(out["pred_disp"][0, :, :, 0], np.float32))
        return np.stack(disps)  # (T, H, W)

    t0 = time.time()
    d32 = stream(params_full, cast=False)
    print(f"f32 stream done ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    d16 = stream(params_full, cast=True)
    print(f"bf16 stream done ({time.time()-t0:.0f}s)", flush=True)

    err32 = np.abs(d32 - dp[None])[:, valid]
    err16 = np.abs(d16 - dp[None])[:, valid]
    delta = np.abs(d32 - d16)[:, valid]
    # temporal EPE analogue on the static scene: frame-to-frame prediction
    # change error (gt change is zero in stabilized coords; the pan only
    # moves texture, disparity is static)
    t32 = np.abs(np.diff(d32, axis=0))[:, valid].mean()
    t16 = np.abs(np.diff(d16, axis=0))[:, valid].mean()
    print(f"EPE  f32={err32.mean():.4f}px  bf16={err16.mean():.4f}px  "
          f"(frame0 f32={np.abs(d32[0]-dp)[valid].mean():.4f})")
    print(f"TEPE-proxy f32={t32:.4f}px bf16={t16:.4f}px")
    print(f"|disp_f32 - disp_bf16|: mean={delta.mean():.4f}px "
          f"p99={np.percentile(delta, 99):.4f}px max={delta.max():.4f}px")
    print("VERDICT-rule (<0.05px mean delta):",
          "PASS -> bf16 can be default" if delta.mean() < 0.05 else "FAIL")
    print("PROTOCOL NOTE: this certifies bf16 NUMERICS on a briefly "
          "trained stereo net + random-init motion/fusion — not accuracy "
          "vs the reference's pretrained checkpoints, which are "
          "unreachable offline (VERDICT r4 weak #7).  Re-run against "
          "real checkpoints when/if they appear.")


if __name__ == "__main__":
    main()
