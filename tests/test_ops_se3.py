"""SE(3) field math: group axioms, exp/log roundtrip, action consistency."""

import numpy as np

import jax.numpy as jnp

from codd_tpu.ops import se3


def _rand_twists(rng, shape, scale=0.5):
    return jnp.asarray(rng.randn(*shape, 6).astype(np.float32) * scale)


def test_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    tau = _rand_twists(rng, (4, 5))
    g = se3.exp(tau)
    np.testing.assert_allclose(np.asarray(se3.log(g)), np.asarray(tau),
                               atol=1e-5, rtol=1e-4)


def test_exp_small_angle_stable():
    tau = jnp.zeros((3, 6)).at[1].set(1e-10).at[2, :3].set(0.3)
    g = se3.exp(tau)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g[0]), [0, 0, 0, 0, 0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(g[2, :3]), [0.3, 0.3, 0.3], atol=1e-6)
    back = se3.log(g)
    np.testing.assert_allclose(np.asarray(back), np.asarray(tau), atol=1e-7)


def test_group_axioms():
    rng = np.random.RandomState(1)
    a = se3.exp(_rand_twists(rng, (8,)))
    b = se3.exp(_rand_twists(rng, (8,)))
    p = jnp.asarray(rng.randn(8, 3).astype(np.float32))

    # (a*b) p == a (b p)
    np.testing.assert_allclose(
        np.asarray(se3.act(se3.mul(a, b), p)),
        np.asarray(se3.act(a, se3.act(b, p))),
        atol=1e-5,
    )
    # a * a^-1 == id
    e = se3.mul(a, se3.inv(a))
    np.testing.assert_allclose(np.asarray(e[..., :3]), 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(e[..., 6])), 1, atol=1e-5)


def test_matrix_agrees_with_act():
    rng = np.random.RandomState(2)
    g = se3.exp(_rand_twists(rng, (6,)))
    p = jnp.asarray(rng.randn(6, 3).astype(np.float32))
    M = np.asarray(se3.matrix(g))
    hom = np.concatenate([np.asarray(p), np.ones((6, 1), np.float32)], -1)
    ref = np.einsum("nij,nj->ni", M, hom)[:, :3]
    np.testing.assert_allclose(np.asarray(se3.act(g, p)), ref, atol=1e-5)


def test_identity():
    g = se3.identity((2, 3))
    p = jnp.asarray(np.random.randn(2, 3, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(se3.act(g, p)), np.asarray(p), atol=1e-6)
