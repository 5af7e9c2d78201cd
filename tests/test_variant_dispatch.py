"""Dispatch wiring for the round-5 opt-in variants: gn_step(impl="fused"),
splat_render(impl="xla_window"/"xla_sort_window"), and the hitnet
"pallas" tile-warp variant — each must produce the incumbent path's
numbers through the PUBLIC entry point (the typo'd-knob measurement trap:
an A/B must exercise the path it claims to)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codd_tpu.ops.gn import gn_step
from codd_tpu.ops.splat import splat_render


def _gn_inputs(rng, B=1, h=8, w=128, C=16):
    Ts = jnp.asarray(
        np.concatenate([rng.randn(B, h, w, 3) * 0.01,
                        np.zeros((B, h, w, 3)),
                        np.ones((B, h, w, 1))], -1).astype(np.float32))
    ae = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    target = jnp.asarray(rng.randn(B, h, w, 3).astype(np.float32) * 0.1)
    weight = jnp.asarray(rng.rand(B, h, w, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, h, w) * 10 + 1).astype(np.float32))
    intr = jnp.asarray([[450.0, 450.0, w / 2, h / 2]] * B, jnp.float32)
    return Ts, ae, target, weight, depth, intr


def test_gn_step_fused_matches_windowed():
    rng = np.random.RandomState(0)
    args = _gn_inputs(rng)
    ref = np.asarray(gn_step(*args, impl="windowed"))
    got = np.asarray(gn_step(*args, impl="fused"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def _cloud(rng, H, W, C, N=2000):
    z = rng.rand(N) * 20 + 1.0
    x = (rng.rand(N) * W - W / 2) / 450.0 * z
    y = (rng.rand(N) * H - H / 2) / 450.0 * z
    pts = jnp.asarray(np.stack([x, y, z], -1).astype(np.float32))[None]
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))[None]
    intr = jnp.asarray([[450.0, 450.0, W / 2, H / 2]], jnp.float32)
    return pts, feats, intr


@pytest.mark.parametrize("impl", ["xla_window", "xla_sort_window"])
def test_splat_render_window_dispatch(impl):
    rng = np.random.RandomState(1)
    pts, feats, intr = _cloud(rng, 32, 48, 6)
    ref = splat_render(pts, feats, intr, 32, 48, impl="xla_gather")
    got = splat_render(pts, feats, intr, 32, 48, impl=impl)
    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        # log-space transmittance vs cumulative products: accumulation
        # order differs, exact equality does not hold
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3)


def test_tile_warp_pallas_variant_dispatch():
    from codd_tpu.models.stereo.hitnet import (_resolve_warp_variant,
                                               tile_warping)
    from codd_tpu.ops.pallas.tile_warp import tile_warp_cost

    assert _resolve_warp_variant("pallas") == "pallas"
    with pytest.raises(AssertionError):
        _resolve_warp_variant("palas")

    rng = np.random.RandomState(2)
    B, H, W, C = 1, 16, 64, 8
    fl = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fr = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    hyp3 = jnp.asarray(np.stack(
        [rng.rand(B, 4, 16) * 20, rng.uniform(-1, 1, (B, 4, 16)),
         rng.uniform(-1, 1, (B, 4, 16))], -1).astype(np.float32))
    ref = np.asarray(tile_warping(hyp3, fl, fr))
    got = np.asarray(tile_warp_cost(hyp3, fl, fr, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gn_unroll_matches_scan():
    """gn_unroll only changes lax.scan's unroll factor (eval path) — the
    math is identical, so outputs must match the unroll=1 scan."""
    from codd_tpu.models.motion.raft3d import RAFT3D

    rng = np.random.RandomState(2)
    B, H, W = 1, 32, 64
    h8, w8 = H // 8, W // 8
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    dprev = jnp.asarray((rng.rand(B, H, W) * 10 + 1).astype(np.float32))
    dcur = jnp.asarray((rng.rand(B, H, W) * 10 + 1).astype(np.float32))
    intr = jnp.asarray([[45.0, 45.0, W / 2, H / 2]], jnp.float32)
    fmap = jnp.asarray(rng.randn(B, h8, w8, 128).astype(np.float32) * 0.1)
    netinp = jnp.asarray(rng.randn(B, h8, w8, 512).astype(np.float32) * 0.1)

    def run(unroll):
        m = RAFT3D(iters=4, gn_unroll=unroll)
        params = m.init(jax.random.PRNGKey(0), img, dprev, dcur, intr,
                        fmap, netinp)
        out, _, _ = m.apply(params, img, dprev, dcur, intr, fmap, netinp)
        return out

    ref = run(1)
    for unroll in (2, 4):
        got = run(unroll)
        for k in ("Ts", "flow2d_est_induced", "weight"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]),
                                       rtol=1e-5, atol=1e-5, err_msg=k)
