"""Gauss-Newton solver: tiny-Cholesky correctness and GN convergence on a
synthetic rigid-motion problem."""

import numpy as np

import jax
import jax.numpy as jnp

from codd_tpu.ops import se3, gn, projective


def test_cholesky_solve_small_matches_numpy():
    rng = np.random.RandomState(0)
    A = rng.randn(50, 6, 6).astype(np.float32)
    H = np.einsum("nij,nkj->nik", A, A) + 6 * np.eye(6, dtype=np.float32)
    b = rng.randn(50, 6).astype(np.float32)
    x = np.asarray(gn.cholesky_solve_small(jnp.asarray(H), jnp.asarray(b)))
    ref = np.stack([np.linalg.solve(H[i], b[i]) for i in range(50)])
    np.testing.assert_allclose(x, ref, atol=1e-3, rtol=1e-3)


def test_gn_step_recovers_rigid_motion():
    """A constant SE3 motion with exact targets should be recovered by a few
    damped GN iterations when the embedding field is constant (full support)."""
    rng = np.random.RandomState(1)
    B, h, w = 1, 8, 10
    intr = jnp.asarray([[20.0, 20.0, w / 2, h / 2]], jnp.float32)
    depth = jnp.asarray(2.0 + rng.rand(B, h, w).astype(np.float32))

    true_tau = jnp.asarray([[0.05, -0.03, 0.08, 0.02, -0.015, 0.01]], jnp.float32)
    Ttrue = jnp.broadcast_to(se3.exp(true_tau)[:, None, None, :], (B, h, w, 7))

    target, _ = projective.projective_transform(Ttrue, depth, intr)

    ae = jnp.zeros((B, h, w, 16), jnp.float32)
    weight = jnp.ones((B, h, w, 3), jnp.float32)

    step = jax.jit(lambda T: gn.gn_step(T, ae, target, weight, depth, intr,
                                        radius=32, ep=1.0))
    Ts = se3.identity((B, h, w))
    for _ in range(8):
        Ts = step(Ts)

    tau = np.asarray(se3.log(Ts))
    err = np.abs(tau - np.asarray(true_tau)[0]).max()
    assert err < 5e-3, f"GN failed to converge, err={err}"


def test_gn_step_differentiable_and_grad_clip():
    rng = np.random.RandomState(2)
    B, h, w = 1, 6, 8
    intr = jnp.asarray([[15.0, 15.0, 4.0, 3.0]], jnp.float32)
    depth = jnp.asarray(1.5 + rng.rand(B, h, w).astype(np.float32))
    target = jnp.asarray(rng.rand(B, h, w, 3).astype(np.float32))

    def loss_fn(ae):
        Ts = se3.identity((B, h, w))
        Ts = gn.gn_step(Ts, ae, target, jnp.ones((B, h, w, 3)), depth, intr)
        return jnp.sum(se3.log(Ts) ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(rng.rand(B, h, w, 8).astype(np.float32)))
    assert np.isfinite(np.asarray(g)).all()

    # incoming grad 1.0 > 0.01 -> zeroed at the clip
    gc = jax.grad(lambda x: jnp.sum(gn.grad_clip(x)))(jnp.ones((4,)))
    np.testing.assert_array_equal(np.asarray(gc), 0.0)
    # incoming grad 0.005 < 0.01 -> passes through unchanged
    gc2 = jax.grad(lambda x: jnp.sum(gn.grad_clip(x) * 0.005))(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(gc2), 0.005, rtol=1e-5)


def test_windowed_aggregate_matches_dense():
    """Column-blocked windowed GN aggregation == dense (n, n) path
    (ops/gn.py:_windowed_aggregate; VERDICT round-1 item 5)."""
    import os

    rng = np.random.RandomState(3)
    B, h, w, C = 1, 8, 128, 4  # w > 3*32 so the windowed path triggers
    ae = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    vals = jnp.asarray(rng.randn(B, h, w, 27).astype(np.float32) * 10)

    agg_win = gn._windowed_aggregate(ae, vals, radius=32)

    n = h * w
    aef = ae.reshape(B, n, C)
    sq = jnp.sum(aef * aef, axis=-1)
    logits = (2.0 * jnp.einsum("bic,bjc->bij", aef, aef)
              - sq[:, :, None] - sq[:, None, :])
    ys, xs = jnp.divmod(jnp.arange(n), w)
    inside = ((jnp.abs(ys[:, None] - ys[None, :]) <= 32)
              & (jnp.abs(xs[:, None] - xs[None, :]) <= 32))
    scores = jax.nn.sigmoid(logits) * inside[None].astype(jnp.float32)
    agg_dense = jnp.einsum("bij,bjc->bic", scores,
                           vals.reshape(B, n, 27)).reshape(B, h, w, 27)

    np.testing.assert_allclose(np.asarray(agg_win), np.asarray(agg_dense),
                               rtol=1e-4, atol=1e-3)


def test_pallas_window_aggregate_matches_dense():
    """Flash-style Pallas windowed aggregation (interpret mode on CPU) ==
    windowed XLA path (ops/pallas/gn_window.py)."""
    from codd_tpu.ops.pallas.gn_window import gn_window_aggregate

    rng = np.random.RandomState(4)
    B, h, w, C = 1, 12, 128, 4   # h % QH != 0 exercises row padding
    ae = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    vals = jnp.asarray(rng.randn(B, h, w, 27).astype(np.float32) * 10)

    agg_ref = gn._windowed_aggregate(ae, vals, radius=32)
    agg_pl = gn_window_aggregate(ae, vals, radius=32, interpret=True)
    np.testing.assert_allclose(np.asarray(agg_pl), np.asarray(agg_ref),
                               rtol=1e-4, atol=1e-3)

    agg_bf = gn_window_aggregate(ae, vals, radius=32, bf16_scores=True,
                                 interpret=True)
    ref = np.asarray(agg_ref)
    rel = np.abs(np.asarray(agg_bf) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, f"bf16 scores rel err {rel}"
