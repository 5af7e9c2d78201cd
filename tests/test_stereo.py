"""HITNet stereo: shapes, init-cost correctness, jit-ability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codd_tpu.models.stereo.hitnet import (
    HITNetStereo, HITUNet, _warp_by_disp, calc_init_cost, tile_warping,
    tile_warping_grouped, tile_warping_tilewin,
)
from codd_tpu.ops.upsample import pixel_unshuffle, to_plane


@pytest.mark.parametrize("variant", ["unrolled", "map", "phases"])
@pytest.mark.parametrize("D", [6, 8])  # 6 exercises the D%4!=0 map fallback
def test_calc_init_cost_gather_semantics(variant, D):
    rng = np.random.RandomState(0)
    B, ht, wt, C = 1, 3, 5, 4
    wr = 4 * wt
    fl = rng.randn(B, ht, wt, C).astype(np.float32)
    fr = rng.randn(B, ht, wr, C).astype(np.float32)
    cost = np.asarray(calc_init_cost(jnp.asarray(fl), jnp.asarray(fr), D,
                                     variant))
    assert cost.shape == (B, ht, wt, D)
    for i in range(wt):
        for d in range(D):
            x = 4 * i - d
            r = fr[0, :, x] if 0 <= x < wr else np.zeros((ht, C), np.float32)
            ref = np.abs(fl[0, :, i] - r).sum(-1)
            np.testing.assert_allclose(cost[0, :, i, d], ref, atol=1e-5)


def test_tile_warping_matches_per_warp_oracle():
    """Fused 4-column tile_warping == the reference's three separate
    plane-disparity warps (propagation.py:61-86), including out-of-image
    samples (zeros padding) and exactly-integer disparities (ADVICE r2)."""
    rng = np.random.RandomState(3)
    B, H, W, C = 2, 8, 16, 5
    fea_l = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fea_r = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ht, wt = H // 4, W // 4
    # hypotheses: mix of fractional, exact-integer, and out-of-range disps
    d = rng.uniform(-3, W + 3, (B, ht, wt)).astype(np.float32)
    d[0, 0, :] = np.arange(wt, dtype=np.float32)  # integer disparities
    dx = rng.uniform(-0.5, 0.5, (B, ht, wt)).astype(np.float32)
    dy = rng.uniform(-0.5, 0.5, (B, ht, wt)).astype(np.float32)
    hyp3 = jnp.asarray(np.stack([d, dx, dy], axis=-1))

    got = tile_warping(hyp3, fea_l, fea_r)

    # oracle: per-offset horizontal warps at plane disparity + k
    local_d = to_plane(hyp3[..., 0], hyp3[..., 1], hyp3[..., 2], size=4)
    cvs = []
    for k in (-1.0, 0.0, 1.0):
        warped = _warp_by_disp(fea_r, local_d + k)
        cv = jnp.sum(jnp.abs(fea_l - warped), axis=-1, keepdims=True)
        cvs.append(pixel_unshuffle(cv, 4))
    want = jnp.concatenate(cvs, -1)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    # the tile-window variant (TPU production path) is exact within its
    # slant bound (1.5*(|1-dx|+|dy|) <= 8; here <= 3), incl. out-of-image
    # windows — same oracle, same tolerance
    got_tw = tile_warping_tilewin(hyp3, fea_l, fea_r)
    np.testing.assert_allclose(np.asarray(got_tw), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_tile_warping_grouped_matches_exact():
    """Row-anchored group-gather variant == the exact path inside its
    contract (3*|1-dx| <= bw-5, dy-free), incl. integer and out-of-range
    disparities and band clamping at both image edges."""
    rng = np.random.RandomState(7)
    B, H, W, C = 2, 8, 160, 5
    fea_l = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fea_r = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ht, wt = H // 4, W // 4
    d = rng.uniform(-6, W + 6, (B, ht, wt)).astype(np.float32)
    d[0, 0, :] = np.arange(wt, dtype=np.float32)  # integer disparities
    # dx spans the full contract range; dy is unbounded by design
    dx = rng.uniform(-1.3, 3.3, (B, ht, wt)).astype(np.float32)
    dy = rng.uniform(-4.0, 4.0, (B, ht, wt)).astype(np.float32)
    hyp3 = jnp.asarray(np.stack([d, dx, dy], axis=-1))
    got = tile_warping_grouped(hyp3, fea_l, fea_r)
    want = tile_warping(hyp3, fea_l, fea_r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_tile_warping_grouped_differentiable():
    """Grouped warp must carry gradients matching the exact path's on the
    shared support (it replaces a differentiable reference op)."""
    rng = np.random.RandomState(5)
    B, H, W, C = 1, 8, 16, 4
    fea_l = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fea_r = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    hyp3 = jnp.asarray(np.stack(
        [rng.uniform(0, 8, (B, 2, 4)), rng.uniform(-0.5, 0.5, (B, 2, 4)),
         rng.uniform(-0.5, 0.5, (B, 2, 4))], axis=-1).astype(np.float32))

    def loss(h, fl, fr):
        return jnp.sum(tile_warping_grouped(h, fl, fr) ** 2)

    gh, gl, gr = jax.grad(loss, argnums=(0, 1, 2))(hyp3, fea_l, fea_r)
    for g in (gh, gl, gr):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def loss_exact(h, fl, fr):
        return jnp.sum(tile_warping(h, fl, fr) ** 2)

    eh, el, er = jax.grad(loss_exact, argnums=(0, 1, 2))(hyp3, fea_l, fea_r)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(el), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(er), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(eh), atol=1e-3)


def test_tile_warping_tilewin_differentiable():
    """The TPU tile-window warp must carry gradients to hypotheses and
    both feature maps (it replaces a differentiable reference op)."""
    rng = np.random.RandomState(5)
    B, H, W, C = 1, 8, 16, 4
    fea_l = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fea_r = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    hyp3 = jnp.asarray(np.stack(
        [rng.uniform(0, 8, (B, 2, 4)), rng.uniform(-0.5, 0.5, (B, 2, 4)),
         rng.uniform(-0.5, 0.5, (B, 2, 4))], axis=-1).astype(np.float32))

    def loss(h, fl, fr):
        return jnp.sum(tile_warping_tilewin(h, fl, fr) ** 2)

    gh, gl, gr = jax.grad(loss, argnums=(0, 1, 2))(hyp3, fea_l, fea_r)
    for g in (gh, gl, gr):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    # grads match the exact path's on the shared (in-bound) support
    def loss_exact(h, fl, fr):
        return jnp.sum(tile_warping(h, fl, fr) ** 2)

    eh, el, er = jax.grad(loss_exact, argnums=(0, 1, 2))(hyp3, fea_l, fea_r)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(el), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(er), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(eh), atol=1e-3)


def test_tile_warping_tilewin_large_image_edges():
    """tilewin at a wider image: window clamping at both edges and large
    disparities across several 128-col blocks must match the exact path."""
    rng = np.random.RandomState(11)
    B, H, W, C = 1, 8, 160, 4
    fea_l = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fea_r = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ht, wt = H // 4, W // 4
    d = rng.uniform(-6, W + 6, (B, ht, wt)).astype(np.float32)
    dx = rng.uniform(-2.0, 2.0, (B, ht, wt)).astype(np.float32)
    dy = rng.uniform(-1.0, 1.0, (B, ht, wt)).astype(np.float32)
    hyp3 = jnp.asarray(np.stack([d, dx, dy], axis=-1))
    got = tile_warping_tilewin(hyp3, fea_l, fea_r)
    want = tile_warping(hyp3, fea_l, fea_r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_backbone_pyramid_shapes():
    net = HITUNet()
    x = jnp.zeros((1, 64, 128, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 4, 8, 32), (1, 8, 16, 24), (1, 16, 32, 24),
        (1, 32, 64, 16), (1, 64, 128, 16),
    ]


@pytest.fixture(scope="module")
def stereo_model():
    net = HITNetStereo(max_disp=64)
    l = jnp.zeros((1, 64, 128, 3))
    r = jnp.zeros((1, 64, 128, 3))
    params = net.init(jax.random.PRNGKey(0), l, r)
    return net, params


def test_stereo_eval_forward(stereo_model):
    net, params = stereo_model
    rng = np.random.RandomState(1)
    l = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    r = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    out = jax.jit(lambda p, a, b: net.apply(p, a, b))(params, l, r)
    disp = np.asarray(out["pred_disp"])
    assert disp.shape == (1, 64, 128, 1)
    assert (disp >= 0).all() and np.isfinite(disp).all()
    assert out["left_feat"].shape == (1, 16, 32, 24)


def test_stereo_train_forward_pyramids(stereo_model):
    net, params = stereo_model
    rng = np.random.RandomState(2)
    l = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    r = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    out = net.apply(params, l, r, train=True)
    assert len(out["prop_disp_pyramid"]) == 12
    assert len(out["w_pyramid"]) == 8
    for p in out["prop_disp_pyramid"]:
        assert p.shape == (1, 64, 128, 1)
    assert len(out["init_cv_pyramid"]) == 5
    assert out["init_cv_pyramid"][0].shape == (1, 1, 2, 4)   # 1/64 res, D=4
    assert out["init_cv_pyramid"][4].shape == (1, 16, 32, 64)  # 1/4 res, D=64
