"""Full CODD estimator: 2-frame forward, carry contract, jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codd_tpu.models.codd import CODD, CoddCarry


@pytest.fixture(scope="module")
def codd_setup():
    model = CODD(max_disp=64, iters=2, fusion_channel=32)
    rng = np.random.RandomState(0)
    B, T, H, W = 1, 2, 64, 128
    left = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
    intr = jnp.asarray([[100.0, 100.0, W / 2, H / 2]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), left, right, intr)
    return model, params, left, right, intr


def test_two_frame_forward(codd_setup):
    model, params, left, right, intr = codd_setup
    outs = model.apply(params, left, right, intr)
    assert len(outs) == 2
    d0 = np.asarray(outs[0]["pred_disp"])
    d1 = np.asarray(outs[1]["pred_disp"])
    assert d0.shape == (1, 64, 128, 1) and d1.shape == (1, 64, 128, 1)
    assert np.isfinite(d0).all() and np.isfinite(d1).all()
    assert (d0 >= 0).all() and (d1 >= 0).all()
    # frame 1 must expose the motion/fusion products
    for k in ("Ts", "flow2d_est_induced", "weight",
              "fusion_weights", "reset_weights", "pred_curr", "pred_warp"):
        assert k in outs[1], k
    assert outs[1]["Ts"].shape == (1, 64, 128, 7)
    w = np.asarray(outs[1]["fusion_weights"])
    assert (w >= 0).all() and (w <= 1).all()


def test_streaming_carry_matches_unrolled(codd_setup):
    """Online per-frame stepping must equal the unrolled forward."""
    model, params, left, right, intr = codd_setup
    outs = model.apply(params, left, right, intr)

    carry, o0 = model.apply(params, left[:, 0], right[:, 0], intr,
                            method=CODD.first_step)
    assert isinstance(carry, CoddCarry)
    carry, o1 = model.apply(params, carry, left[:, 1], right[:, 1], intr,
                            method=CODD.step)
    np.testing.assert_allclose(np.asarray(o0["pred_disp"]),
                               np.asarray(outs[0]["pred_disp"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1["pred_disp"]),
                               np.asarray(outs[1]["pred_disp"]), atol=1e-5)
    # carry is a static-shape pytree suitable for lax.scan
    assert carry.memory_disp.shape == (1, 64, 128)
    assert carry.fmap.shape == (1, 8, 16, 128)
    assert carry.netinp.shape == (1, 8, 16, 512)


def test_stereo_only_config():
    model = CODD(max_disp=64, motion_type="none", fusion_type="none")
    rng = np.random.RandomState(1)
    left = jnp.asarray(rng.rand(1, 2, 64, 128, 3).astype(np.float32))
    right = jnp.asarray(rng.rand(1, 2, 64, 128, 3).astype(np.float32))
    intr = jnp.asarray([[100.0, 100.0, 64.0, 32.0]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), left, right, intr)
    outs = model.apply(params, left, right, intr)
    assert np.asarray(outs[1]["pred_disp"]).shape == (1, 64, 128, 1)
    assert "Ts" not in outs[1]
