"""Gradient accumulation: accum_steps=2 reproduces the full-batch update
(losses are batch means, so microbatch-averaged grads are identical)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codd_tpu.losses.assembly import LossConfig
from codd_tpu.models.codd import CODD
from codd_tpu.train.optim import make_optimizer
from codd_tpu.train.trainer import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    H, W, B, T = 64, 64, 2, 2
    rng = np.random.RandomState(0)
    model = CODD(max_disp=16, iters=1, motion_type="none",
                 fusion_type="none")
    batch = {
        "l_img": jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32)),
        "r_img": jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32)),
        "gt_disp": jnp.asarray(
            (rng.rand(B, T, H, W, 1) * 10 + 2).astype(np.float32)),
        "gt_flow": jnp.asarray(
            rng.uniform(-2, 2, (B, T, H, W, 2)).astype(np.float32)),
        "gt_disp_change": jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, T, H, W, 1)).astype(np.float32)),
        "intrinsics": jnp.asarray([[100.0, 100.0, W / 2, H / 2]] * B,
                                  jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["l_img"],
                                 batch["r_img"], batch["intrinsics"])
    return model, params, batch


def test_accum_matches_full_batch(setup):
    model, params, batch = setup
    lc = LossConfig(max_disp=16, disp_range=(1.0, 210.0))
    import optax
    states, logs = [], []
    for accum in (1, 2):
        # SGD(1.0): the param delta IS the averaged gradient (Adam would
        # amplify near-zero-grad reduction-order sign flips to 2*lr)
        tx = optax.sgd(1.0)
        state = create_train_state(params, tx)
        step = make_train_step(model, tx, lc, accum_steps=accum)
        new_state, lg = step(state, batch)
        states.append(new_state)
        logs.append(lg)

    # mean-of-microbatch-means vs full-batch mean: identical weighting when
    # per-term normalizers are per-sample; valid-count normalizers reorder
    # the f32 reduction (and match the reference's per-GPU DDP averaging,
    # codd.py:716-720), so allow reduction-order noise
    np.testing.assert_allclose(float(logs[0]["loss"]),
                               float(logs[1]["loss"]), rtol=5e-4)
    np.testing.assert_allclose(float(logs[0]["grad_norm"]),
                               float(logs[1]["grad_norm"]), rtol=5e-3)
    p0 = jax.tree_util.tree_leaves(states[0].params)
    p1 = jax.tree_util.tree_leaves(states[1].params)
    pb = jax.tree_util.tree_leaves(params)
    # per-leaf gradient comparison, relative to that leaf's gradient scale
    worst = 0.0
    for a, b, base in zip(p0, p1, pb):
        ga, gb = base - a, base - b
        scale = float(jnp.max(jnp.abs(ga))) + 1e-12
        worst = max(worst, float(jnp.max(jnp.abs(ga - gb))) / scale)
    assert worst < 1e-2, f"accumulated-grad divergence {worst}"


def test_accum_requires_divisible_batch(setup):
    model, params, batch = setup
    lc = LossConfig(max_disp=16, disp_range=(1.0, 210.0))
    tx = make_optimizer(lambda s: 1e-4, 1.0, params=params,
                        frozen_prefixes=[])
    state = create_train_state(params, tx)
    step = make_train_step(model, tx, lc, accum_steps=3)
    with pytest.raises(AssertionError):
        step(state, batch)
