"""Interpret-mode equality of the fused GN solve kernel vs the ops.gn
windowed oracle.  NOTE: interpret-mode equality does NOT certify the
Mosaic-compiled kernel (the r4 gn_window lesson) — the on-chip gate is
scripts/check_gn_fused_tpu.py and must pass before the kernel backs any
bench number."""

import numpy as np
import jax.numpy as jnp

from codd_tpu.ops.pallas.gn_fused import (gn_fused_solve,
                                          gn_fused_solve_reference)


def _mk_inputs(B, h, w, C, seed=0):
    rng = np.random.RandomState(seed)
    ae = rng.randn(B, h, w, C).astype(np.float32) * 0.5
    # realistic vals: PSD H from random J^T W J outer products + random b
    J = rng.randn(B, h, w, 3, 6).astype(np.float32)
    W = rng.rand(B, h, w, 3).astype(np.float32)
    M = np.einsum("...ki,...k,...kj->...ij", J, W, J)
    idx = [(i, j) for i in range(6) for j in range(i, 6)]
    Hp = np.stack([M[..., i, j] for i, j in idx], axis=-1)
    b = rng.randn(B, h, w, 6).astype(np.float32)
    vals = np.concatenate([Hp, b], axis=-1)
    return jnp.asarray(ae), jnp.asarray(vals)


def _check(B, h, w, C, bf16_scores=False, tol=2e-4):
    ae, vals = _mk_inputs(B, h, w, C)
    ref = np.asarray(gn_fused_solve_reference(ae, vals,
                                              bf16_scores=bf16_scores))
    got = np.asarray(gn_fused_solve(ae, vals, bf16_scores=bf16_scores,
                                    interpret=True))
    assert got.shape == ref.shape == (B, h, w, 6)
    denom = np.abs(ref).max() + 1e-9
    rel = np.abs(got - ref).max() / denom
    assert rel < tol, f"rel={rel:.3e} at {(B, h, w, C)}"


def test_fused_gn_production_shape():
    _check(1, 48, 160, 16)


def test_fused_gn_small_and_batched():
    _check(2, 8, 128, 16)


def test_fused_gn_bf16_scores():
    # bf16 scores round both paths identically (scores+vals cast to bf16,
    # f32 accumulation); the tolerance absorbs the bf16 quantization
    _check(1, 48, 160, 16, bf16_scores=True, tol=2e-2)
