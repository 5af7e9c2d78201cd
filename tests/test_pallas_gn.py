"""Pallas GN aggregation kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from codd_tpu.ops.pallas.gn_attention import (
    _aggregate_pallas, _aggregate_xla, gn_aggregate,
)


def test_pallas_kernel_matches_xla_interpret():
    rng = np.random.RandomState(0)
    h, w = 12, 24  # n=288 -> 2 blocks with padding
    n = h * w
    ae = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.3)
    vals = jnp.asarray(rng.randn(n, 27).astype(np.float32))
    ref = np.asarray(_aggregate_xla(ae, vals, h, w, radius=5))
    out = np.asarray(_aggregate_pallas(ae, vals, h, w, radius=5,
                                       interpret=True))
    # kernel matmuls use bf16 MXU inputs (f32 accumulate): ~1e-2 relative
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-2)


def test_gn_aggregate_custom_vjp():
    rng = np.random.RandomState(1)
    h, w = 6, 8
    n = h * w
    ae = jnp.asarray(rng.randn(n, 4).astype(np.float32) * 0.3)
    vals = jnp.asarray(rng.randn(n, 27).astype(np.float32))

    def f(a, v):
        return jnp.sum(gn_aggregate(a, v, h, w, 3, False) ** 2)

    ga, gv = jax.grad(f, argnums=(0, 1))(ae, vals)
    # numerical check against direct autodiff of the XLA formulation
    def f_ref(a, v):
        return jnp.sum(_aggregate_xla(a, v, h, w, 3) ** 2)

    ga_r, gv_r = jax.grad(f_ref, argnums=(0, 1))(ae, vals)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r), atol=1e-4)
