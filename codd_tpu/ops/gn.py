"""Dense SE(3) Gauss-Newton step — the TPU re-design of lietorch_extras.

The reference builds per-pixel 6x6 normal equations with a fused CUDA kernel
(`lietorch_extras.se3_build_inplace`, reference: se3_field.py:13-31,150-170)
and solves them with `cholesky6x6` CUDA kernels.  The math:

    for target pixel i:   H_i = sum_j a_ij * J_j^T W_j J_j
                          b_i = sum_j a_ij * J_j^T W_j r_j
    a_ij = sigmoid(-||ae_i - ae_j||^2)   within a square window |di|,|dj| <= radius
    r_j  = target_j - pi(T_j X_j),  J_j = d pi(T X_j)/d xi |_{T_j}  (left perturbation)

Key structural fact exploited here: J, W, r depend only on the *source*
pixel j, so the neighborhood reduction is an attention-weighted aggregation
of a 27-channel value field (21 unique entries of the symmetric 6x6 H + 6
of b).  That is two MXU matmuls (scores + aggregation) — exactly what the
TPU is fastest at — instead of a hand-rolled scatter kernel.  The 6x6
Cholesky solve is unrolled into vectorized element-wise ops (VPU), which
beats lane-wasting batched linalg at this tiny size.

Everything is differentiable by XLA; the reference's custom backward kernels
are unnecessary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3
from .projective import inv_project, project

__all__ = ["gn_step", "cholesky_solve_small", "grad_clip"]


# ---------------------------------------------------------------------------
# GradientClip: straight-through with zeroed exploding/NaN grads
# (reference: raft3d.py:20-41, GRAD_CLIP=0.01)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def grad_clip(x, clip: float = 0.01):
    return x


def _gc_fwd(x, clip):
    return x, clip


def _gc_bwd(clip, g):
    z = jnp.zeros_like(g)
    g = jnp.where(jnp.abs(g) > clip, z, g)
    g = jnp.where(jnp.isnan(g), z, g)
    return (g, None)


grad_clip.defvjp(_gc_fwd, _gc_bwd)


# ---------------------------------------------------------------------------
# Batched tiny Cholesky (unrolled; all element-wise over the pixel dim)
# ---------------------------------------------------------------------------

def cholesky_solve_small(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for SPD H of static small size.

    H: (..., n, n), b: (..., n).  Unrolled LL^T factorization: every scalar
    of the factor is a vectorized op over the leading dims, so the whole
    solve is VPU element-wise work with zero lane waste.
    """
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# ---------------------------------------------------------------------------
# System build + step
# ---------------------------------------------------------------------------

def _skew(v):
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


def _sym_pack(M):
    """(..., 6, 6) symmetric -> (..., 21) upper-tri entries."""
    idx = [(i, j) for i in range(6) for j in range(i, 6)]
    return jnp.stack([M[..., i, j] for i, j in idx], axis=-1)


def _sym_unpack(p):
    """(..., 21) -> (..., 6, 6) symmetric."""
    out = jnp.zeros(p.shape[:-1] + (6, 6), p.dtype)
    k = 0
    for i in range(6):
        for j in range(i, 6):
            out = out.at[..., i, j].set(p[..., k])
            if i != j:
                out = out.at[..., j, i].set(p[..., k])
            k += 1
    return out


def resolve_impl(impl, radius, w):
    """Resolve an impl selector to the concrete aggregation path that
    build_system will take for a 1/8-res field of width ``w`` (so CLIs can
    report it and warn when e.g. bf16_scores is a dense-path no-op)."""
    windowed_ok = (radius == _GN_BLOCK and w % _GN_BLOCK == 0
                   and w > 3 * _GN_BLOCK)
    if impl == "auto":
        return "windowed" if windowed_ok else "dense"
    if impl in ("windowed", "pallas_window", "fused") and not windowed_ok:
        return "dense"
    return impl


def build_system(Ts, ae, target, weight, depth, intrinsics, radius=32,
                 impl="auto", bf16_scores=False):
    """Attention-aggregated GN normal equations.

    Args:
      Ts: (B,h,w,7) SE3 field.  ae: (B,h,w,ae_dim) embeddings (pre-scaled).
      target: (B,h,w,3) [x,y,1/z] targets.  weight: (B,h,w,3) per-component
      confidence.  depth: (B,h,w).  intrinsics: (B,4).
      radius: Chebyshev window radius in pixels (None = full attention).
      impl: "windowed" (column-blocked, HBM-lean — the production path),
        "dense" (materializes the (n, n) score matrix — the test oracle),
        "pallas_window" (flash-style fused kernel: scores never reach HBM;
        forward-only), or "auto" (windowed when the shape is eligible,
        else dense).
      bf16_scores: keep attention scores in bf16 (windowed path only) —
        halves score HBM at ~0.4% relative error.

    Returns (H (B,h,w,6,6), b (B,h,w,6)).
    """
    B, h, w, _ = Ts.shape
    n = h * w
    f32 = jnp.float32

    vals = _build_vals(Ts, target, weight, depth, intrinsics
                       ).reshape(B, n, 27)

    # attention scores over the (windowed) pixel graph — MXU matmul
    aef = ae.astype(f32).reshape(B, n, -1)
    impl = resolve_impl(impl, radius, w)
    assert impl in ("windowed", "dense", "pallas_window"), \
        f"bad GN impl {impl}"
    if impl == "pallas_window":
        from .pallas.gn_window import gn_window_aggregate
        interpret = jax.devices()[0].platform in ("cpu", "gpu", "cuda",
                                                  "rocm")
        if not interpret:
            # The Mosaic-compiled kernel DIVERGES on real TPU (rel err
            # 7.8e-2 at the production shape, scripts/check_gn_pallas_tpu
            # 2026-08-19) while interpret mode matches bit-near; it is
            # also a perf TIE with the XLA windowed path (1.61 vs
            # 1.64 ms/iter).  Fall back until the miscompile is root-
            # caused — silent wrong numbers are never an option.
            # Loud so an A/B labeled pallas_window can't silently
            # measure the windowed path (ADVICE r4 #3).
            import warnings
            warnings.warn(
                "gn_impl='pallas_window' requested on a compiled TPU "
                "backend: falling back to the XLA 'windowed' aggregation "
                "(Mosaic kernel miscompiles on chip, rel 7.8e-2 — "
                "scripts/check_gn_pallas_tpu.py)", stacklevel=2)
            agg = _windowed_aggregate(aef.reshape(B, h, w, -1),
                                      vals.reshape(B, h, w, 27), radius,
                                      bf16_scores=bf16_scores)
        else:
            agg = gn_window_aggregate(ae.astype(f32),
                                      vals.reshape(B, h, w, 27),
                                      radius=radius, bs=_GN_BLOCK,
                                      bf16_scores=bf16_scores,
                                      interpret=interpret)
    elif impl == "windowed":
        agg = _windowed_aggregate(aef.reshape(B, h, w, -1),
                                  vals.reshape(B, h, w, 27), radius,
                                  bf16_scores=bf16_scores)
    else:
        sq = jnp.sum(aef * aef, axis=-1)
        logits = (2.0 * jnp.einsum("bic,bjc->bij", aef, aef)
                  - sq[:, :, None] - sq[:, None, :])
        if radius is not None:
            ys, xs = jnp.divmod(jnp.arange(n), w)
            inside = (jnp.abs(ys[:, None] - ys[None, :]) <= radius) & (
                jnp.abs(xs[:, None] - xs[None, :]) <= radius
            )
            scores = jax.nn.sigmoid(logits) * inside[None].astype(f32)
        else:
            scores = jax.nn.sigmoid(logits)
        agg = jnp.einsum("bij,bjc->bic", scores, vals).reshape(B, h, w, 27)
    Hmat = _sym_unpack(agg[..., :21])
    bvec = agg[..., 21:]
    return Hmat, bvec


def _build_vals(Ts, target, weight, depth, intrinsics):
    """The per-pixel normal-equation value field: 21 packed J^T W J
    entries + 6 J^T W r entries, (B, h, w, 27) f32 — the aggregation
    operand shared by every build_system impl and the fused Pallas
    solve (ops/pallas/gn_fused.py)."""
    f32 = jnp.float32

    X = inv_project(depth, intrinsics).astype(f32)
    Y = se3.act(Ts.astype(f32), X)
    proj = project(Y, intrinsics)
    r = target.astype(f32) - proj  # (B,h,w,3)

    fx = intrinsics[:, 0, None, None].astype(f32)
    fy = intrinsics[:, 1, None, None].astype(f32)
    Yx, Yy, Yz = jnp.moveaxis(Y, -1, 0)
    Zinv = 1.0 / (Yz + 1e-5)
    Z2inv = Zinv * Zinv
    zero = jnp.zeros_like(Zinv)
    # d pi / d Y  (3x3)
    Jpi = jnp.stack(
        [
            jnp.stack([fx * Zinv, zero, -fx * Yx * Z2inv], -1),
            jnp.stack([zero, fy * Zinv, -fy * Yy * Z2inv], -1),
            jnp.stack([zero, zero, -Z2inv], -1),
        ],
        axis=-2,
    )  # (B,h,w,3,3)
    # d Y / d xi = [I | -[Y]x]  for left perturbation exp(xi) * T
    J = jnp.concatenate([Jpi, -jnp.einsum("...ij,...jk->...ik", Jpi, _skew(Y))], axis=-1)  # (B,h,w,3,6)

    Wd = weight.astype(f32)
    JW = J * Wd[..., None]  # (B,h,w,3,6), rows scaled by weight
    M = jnp.einsum("...ki,...kj->...ij", J, JW)  # (B,h,w,6,6) = J^T W J
    v = jnp.einsum("...ki,...k->...i", J, Wd * r)  # (B,h,w,6)

    # value field: 21 unique H entries + 6 b entries
    return jnp.concatenate([_sym_pack(M), v], axis=-1)


_GN_BLOCK = 32  # column block size of the windowed aggregation


def _windowed_aggregate(ae, vals, radius, bf16_scores=False):
    """Column-blocked windowed attention aggregation — identical output to
    the dense (n, n) path for radius == _GN_BLOCK, without materializing
    the full score matrix (VERDICT round-1 item 5).

    Queries in a 32-column block only see keys in the 96-column
    neighborhood [block-32, block+64), so the score tensor shrinks w/96-fold
    in x (>=2x less peak HBM per GN iteration at KITTI 1/8 res); the
    y-window mask is applied exactly.  Scores stay f32 by default for
    bit-parity with the dense path; bf16_scores halves score HBM
    again at ~0.4% relative error.

    ae: (B, h, w, C), vals: (B, h, w, 27).  Returns (B, h, w, 27) f32.
    """
    sdt = jnp.bfloat16 if bf16_scores else jnp.float32
    assert radius == _GN_BLOCK, "windowed path assumes radius == block size"
    B, h, w, C = ae.shape
    bs = _GN_BLOCK
    nb = w // bs
    win = 3 * bs

    aep = jnp.pad(ae, ((0, 0), (0, 0), (bs, bs), (0, 0)))
    vp = jnp.pad(vals, ((0, 0), (0, 0), (bs, bs), (0, 0)))
    # key neighborhoods per block: (B, h, nb, 3*bs, C) — pure slices
    keys = jnp.stack([aep[:, :, k * bs:k * bs + win] for k in range(nb)],
                     axis=2)
    kvals = jnp.stack([vp[:, :, k * bs:k * bs + win] for k in range(nb)],
                      axis=2)
    q = ae.reshape(B, h, nb, bs, C)

    qsq = jnp.sum(q * q, axis=-1)                     # (B,h,nb,bs)
    ksq = jnp.moveaxis(jnp.sum(keys * keys, axis=-1), 1, 2)  # (B,nb,h2,win)
    logits = (2.0 * jnp.einsum("byqic,bzqjc->byqizj", q, keys)
              - qsq[..., None, None] - ksq[:, None, :, None])
    # (B, h, nb, bs, h2, win)

    dy = jnp.abs(jnp.arange(h)[:, None] - jnp.arange(h)[None, :]) <= radius
    dx = jnp.abs((jnp.arange(bs) + bs)[:, None]
                 - jnp.arange(win)[None, :]) <= radius
    mask = (dy[:, None, :, None] & dx[None, :, None, :]
            ).astype(sdt)  # (h, bs, h2, win) -> broadcast over nb
    # broadcast mask over (B, nb): (h, bs, h2, win) -> (1, h, 1, bs, h2, win)
    scores = jax.nn.sigmoid(logits).astype(sdt) * mask[None, :, None, :, :, :]

    agg = jnp.einsum("byqizj,bzqjc->byqic", scores, kvals.astype(sdt),
                     preferred_element_type=jnp.float32)
    return agg.reshape(B, h, w, 27)


def gn_step(Ts, ae, target, weight, depth, intrinsics, radius=32, lm=1e-4,
            ep=10.0, impl="auto", bf16_scores=False):
    """One damped Gauss-Newton update of the dense SE3 field.

    Mirrors reference se3_field.step_inplace (se3_field.py:150-170):
    ae is pre-scaled by 1/8, damping is ``H + (lm*H + ep) * I``, update is
    ``exp(dx) * Ts``.  ``impl``/``bf16_scores`` select the aggregation
    path (see build_system).  ``impl="fused"`` routes aggregation +
    damping + solve through the single Pallas kernel
    (ops/pallas/gn_fused.py) — forward-only (no VJP): inference opt-in,
    gated on-chip by scripts/check_gn_fused_tpu.py.
    """
    ae = ae / 8.0
    if resolve_impl(impl, radius, Ts.shape[2]) == "fused":
        from .pallas.gn_fused import gn_fused_solve
        vals = _build_vals(Ts, target, weight, depth, intrinsics)
        interpret = jax.devices()[0].platform in ("cpu", "gpu", "cuda",
                                                  "rocm")
        dx = gn_fused_solve(ae.astype(jnp.float32), vals, radius=radius,
                            lm=lm, ep=ep, bf16_scores=bf16_scores,
                            interpret=interpret)
        return se3.mul(se3.exp(dx.astype(Ts.dtype)), Ts)
    H, b = build_system(Ts, ae, target, weight, depth, intrinsics, radius,
                        impl=impl, bf16_scores=bf16_scores)
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    H = H + jnp.zeros_like(H).at[..., jnp.arange(6), jnp.arange(6)].set(lm * diag + ep)
    dx = cholesky_solve_small(H, b)
    # failure containment (reference CholeskySolver try/except,
    # se3_field.py:73-87): a non-finite solve becomes a zero update
    dx = jnp.where(jnp.all(jnp.isfinite(dx), axis=-1, keepdims=True), dx, 0.0)
    return se3.mul(se3.exp(dx.astype(Ts.dtype)), Ts)
