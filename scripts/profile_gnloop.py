"""Is lax.scan the problem? Time the 16-iteration GN loop as (a) nn.scan,
(b) a python-unrolled loop of the same body, excluding encoders."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from bench_util import chain_time  # noqa: E402

import flax.linen as nn
from codd_tpu.models.motion.raft3d import GNIteration, RAFT3D
from codd_tpu.ops import corr as corr_ops
from codd_tpu.ops import se3
from codd_tpu.ops.warp import meshgrid_xy

B, H, W = 1, 384, 1280
h8, w8 = H // 8, W // 8
rng = np.random.RandomState(0)

fmap1 = jnp.asarray(rng.randn(B, h8, w8, 128).astype(np.float32))
fmap2 = jnp.asarray(rng.randn(B, h8, w8, 128).astype(np.float32))
pyramid = jax.jit(corr_ops.build_corr_pyramid)(fmap1, fmap2)
net = jnp.asarray(np.tanh(rng.randn(B, h8, w8, 128)).astype(np.float32))
inp = jnp.asarray(np.maximum(rng.randn(B, h8, w8, 384), 0).astype(np.float32))
depth_prev = jnp.asarray((rng.rand(B, H, W) * 20 + 1).astype(np.float32))
depth1_r8 = depth_prev[:, 3::8, 3::8]
zinv2 = 1.0 / depth1_r8
intr = jnp.asarray([[450.0, 450.0, W / 2, H / 2]], jnp.float32)
intr8 = intr / 8.0
x0, y0 = meshgrid_xy(h8, w8, jnp.float32)
coords0 = jnp.broadcast_to(jnp.stack([x0, y0], -1)[None], (B, h8, w8, 2))
Ts0 = se3.identity((B, h8, w8), jnp.float32)
mask0 = jnp.zeros((B, h8, w8, 64 * 9))
weight0 = jnp.zeros((B, h8, w8, 3))

body = GNIteration(hidden_dim=128, corr_radius=3)
carry0 = (net, Ts0, mask0, weight0, inp, pyramid, depth1_r8, zinv2,
          intr8, coords0, depth_prev, intr)
params = jax.jit(body.init)(jax.random.PRNGKey(0), carry0, None)

ITERS = 16


def unrolled(net_in):
    c = (net_in,) + carry0[1:]
    for _ in range(ITERS):
        c, _ = body.apply(params, c, None)
    return c[1]  # Ts


def scanned(net_in):
    c = (net_in,) + carry0[1:]

    def f(c, _):
        return body.apply(params, c, None)

    c, _ = jax.lax.scan(f, c, None, length=ITERS)
    return c[1]


print(f"one iter: {chain_time(lambda n: body.apply(params, (n,) + carry0[1:], None)[0][0], (net,), k=16):.2f} ms",
      flush=True)
print(f"unrolled x{ITERS}: {chain_time(unrolled, (net,), k=3):.1f} ms",
      flush=True)
print(f"scan x{ITERS}: {chain_time(scanned, (net,), k=3):.1f} ms", flush=True)
