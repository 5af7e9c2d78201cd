"""GN-iteration breakdown at KITTI 1/8 res: corr lookup / update block /
gn aggregation / se3+projective glue."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from bench_util import chain_time  # noqa: E402

from codd_tpu.models.motion.raft3d import BasicUpdateBlock
from codd_tpu.ops import se3
from codd_tpu.ops.corr import build_corr_pyramid, corr_lookup
from codd_tpu.ops.gn import gn_step
from codd_tpu.ops.projective import induced_flow, inv_project, projective_transform

B, H, W = 1, 384, 1280
h, w = H // 8, W // 8
rng = np.random.RandomState(0)
f1 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))
f2 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))
coords = jnp.asarray(
    np.stack(np.meshgrid(np.arange(w), np.arange(h), indexing="xy"), -1)
    [None].astype(np.float32) + rng.rand(B, h, w, 2).astype(np.float32))
pyr = jax.jit(build_corr_pyramid)(f1, f2)
pyr = jax.tree.map(jax.block_until_ready, pyr)

print(f"corr build: {chain_time(lambda a, b: corr_lookup(build_corr_pyramid(a, b), coords)[..., :1], (f1, f2), k=12):.2f} ms",
      flush=True)
print(f"corr lookup: {chain_time(lambda c: corr_lookup(pyr, c), (coords,), k=24):.2f} ms",
      flush=True)

ub = BasicUpdateBlock()
net = jnp.asarray(np.tanh(rng.randn(B, h, w, 128)).astype(np.float32))
inp = jnp.asarray(np.maximum(rng.randn(B, h, w, 384), 0).astype(np.float32))
corr = jnp.asarray(rng.randn(B, h, w, 196).astype(np.float32))
flow = jnp.asarray(rng.randn(B, h, w, 2).astype(np.float32))
dz = jnp.asarray(rng.randn(B, h, w, 1).astype(np.float32))
twist = jnp.asarray(rng.randn(B, h, w, 6).astype(np.float32))
up = jax.jit(ub.init)(jax.random.PRNGKey(0), net, inp, corr, flow, dz, twist)

print(f"update block: {chain_time(lambda n: ub.apply(up, n, inp, corr, flow, dz, twist)[0], (net,), k=16):.2f} ms",
      flush=True)

Ts = jnp.zeros((B, h, w, 7)).at[..., 6].set(1.0)
ae = jnp.asarray(rng.randn(B, h, w, 32).astype(np.float32))
target = jnp.asarray(rng.randn(B, h, w, 3).astype(np.float32))
weight = jnp.asarray(rng.rand(B, h, w, 3).astype(np.float32))
depth = jnp.asarray((rng.rand(B, h, w) * 20 + 1).astype(np.float32))
intr8 = jnp.asarray([[450.0 / 8, 450.0 / 8, w / 2, h / 2]], jnp.float32)

print(f"gn_step: {chain_time(lambda t: gn_step(t, ae, target, weight, depth, intr8)[..., :1], (Ts,), k=16):.2f} ms",
      flush=True)

def glue(t):
    X1 = inv_project(depth, intr8)
    coords1, val = projective_transform(t, depth, intr8)
    fl2d, fl3d, _ = induced_flow(t, depth, intr8)
    return coords1[..., :1] + fl2d[..., :1]

print(f"projective glue: {chain_time(glue, (Ts,), k=24):.2f} ms", flush=True)
