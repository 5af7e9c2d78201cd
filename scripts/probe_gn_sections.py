"""Section-level timing inside gn_step at the production 1/8-res KITTI
shape: J/M/v build, windowed aggregation, damped Cholesky solve, SE(3)
retraction.  The bf16-scores A/B (probe_gn_scores) showed the aggregation
is NOT score-HBM-bound, so the 1.6 ms/iter must sit in the small-tensor
glue (3/6-wide minor dims pad 21-42x under (8,128) tiling).

fori-chained single dispatch per section, hard host-fetch sync.
Usage: python scripts/probe_gn_sections.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops import se3  # noqa: E402
from codd_tpu.ops import gn  # noqa: E402
from codd_tpu.ops.projective import inv_project, project  # noqa: E402

B, H, W = 1, 384, 1280
h8, w8 = H // 8, W // 8
ITERS = 64
rng = np.random.RandomState(0)

Ts0 = se3.identity((B, h8, w8), jnp.float32)
ae = jnp.asarray(rng.randn(B, h8, w8, 16).astype(np.float32)) / 8.0
target = jnp.asarray(rng.rand(B, h8, w8, 3).astype(np.float32))
weight = jnp.asarray(rng.rand(B, h8, w8, 3).astype(np.float32))
depth = jnp.asarray((rng.rand(B, h8, w8) * 20 + 1).astype(np.float32))
intr = jnp.asarray([[450.0 / 8, 450.0 / 8, W / 16, H / 16]], jnp.float32)
vals0 = jnp.asarray(rng.randn(B, h8, w8, 27).astype(np.float32))
Hmat0 = jnp.asarray(rng.randn(B, h8, w8, 6, 6).astype(np.float32))
Hmat0 = jnp.einsum("...ij,...kj->...ik", Hmat0, Hmat0) + \
    10.0 * jnp.eye(6)[None, None, None]
bvec0 = jnp.asarray(rng.randn(B, h8, w8, 6).astype(np.float32))


def chain(fn, seed, k=ITERS):
    @jax.jit
    def run(s):
        def body(i, c):
            out = fn(jax.tree_util.tree_map(
                lambda a: a + (c * 0).astype(a.dtype), s))
            red = sum(jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(out))
            return c + red * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    _ = float(np.asarray(run(seed)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(seed)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def build_jmv(args):
    Ts, depth = args
    X = inv_project(depth, intr)
    Y = se3.act(Ts, X)
    proj = project(Y, intr)
    r = target - proj
    fx = intr[:, 0, None, None]
    fy = intr[:, 1, None, None]
    Yx, Yy, Yz = jnp.moveaxis(Y, -1, 0)
    Zinv = 1.0 / (Yz + 1e-5)
    Z2inv = Zinv * Zinv
    zero = jnp.zeros_like(Zinv)
    Jpi = jnp.stack([
        jnp.stack([fx * Zinv, zero, -fx * Yx * Z2inv], -1),
        jnp.stack([zero, fy * Zinv, -fy * Yy * Z2inv], -1),
        jnp.stack([zero, zero, -Z2inv], -1)], axis=-2)
    J = jnp.concatenate(
        [Jpi, -jnp.einsum("...ij,...jk->...ik", Jpi, gn._skew(Y))], axis=-1)
    JW = J * weight[..., None]
    M = jnp.einsum("...ki,...kj->...ij", J, JW)
    v = jnp.einsum("...ki,...k->...i", J, weight * r)
    return jnp.concatenate([gn._sym_pack(M), v], axis=-1)


def aggregate(args):
    (a, v) = args
    return gn._windowed_aggregate(a, v, radius=32)


def solve(args):
    Hm, bv = args
    diag = jnp.diagonal(Hm, axis1=-2, axis2=-1)
    Hd = Hm + jnp.zeros_like(Hm).at[..., jnp.arange(6), jnp.arange(6)].set(
        1e-4 * diag + 10.0)
    dx = gn.cholesky_solve_small(Hd, bv)
    return jnp.where(jnp.all(jnp.isfinite(dx), axis=-1, keepdims=True),
                     dx, 0.0)


def retract(args):
    dx, Ts = args
    return se3.mul(se3.exp(dx), Ts)


def unpack(args):
    (a,) = args
    return gn._sym_unpack(a[..., :21])


print(f"build J/M/v + pack:  {chain(build_jmv, (Ts0, depth)):.3f} ms",
      flush=True)
print(f"windowed aggregate:  {chain(aggregate, (ae, vals0)):.3f} ms",
      flush=True)
print(f"sym_unpack:          {chain(unpack, (vals0,)):.3f} ms", flush=True)
print(f"damp + cholesky:     {chain(solve, (Hmat0, bvec0)):.3f} ms",
      flush=True)
print(f"se3 exp+mul:         {chain(retract, (bvec0, Ts0)):.3f} ms",
      flush=True)
full = chain(lambda a: gn.gn_step(a[0], ae * 8.0, target, weight, a[1], intr,
                                  impl="windowed"), (Ts0, depth))
print(f"full gn_step:        {full:.3f} ms", flush=True)
