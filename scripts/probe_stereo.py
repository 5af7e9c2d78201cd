"""Single-dispatch stereo timing: fori_loop-chained HITNetStereo eval
forward at KITTI res, hard host-fetch sync (no chain_time differencing)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.stereo.hitnet import HITNetStereo  # noqa: E402

H, W = 384, 1280
ITERS = 8
rng = np.random.RandomState(0)
l = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
r = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

stereo = HITNetStereo(max_disp=320)
sp = jax.jit(stereo.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 128, 3)),
                          jnp.zeros((1, 64, 128, 3)))

bf16 = "--bf16" in sys.argv
if bf16:
    from codd_tpu.utils.precision import cast_floats
    sp = cast_floats(sp)
    l, r = l.astype(jnp.bfloat16), r.astype(jnp.bfloat16)


@jax.jit
def chain(l, r):
    def body(i, carry):
        x, acc = carry
        d = stereo.apply(sp, x, r, train=False)["pred_disp"]
        # data dependency: perturb the input with the output mean
        x = l + (d.mean() * 1e-6).astype(l.dtype)
        return (x, acc + d[0, 0, 0, 0])
    return jax.lax.fori_loop(0, ITERS, body, (l, jnp.float32(0)))


t0 = time.perf_counter()
_, acc = chain(l, r)
print(f"[compile+first {time.perf_counter()-t0:.0f}s]", float(acc))
for trial in range(3):
    t0 = time.perf_counter()
    _, acc = chain(l, r)
    acc = float(np.asarray(acc))
    dt = time.perf_counter() - t0
    print(f"stereo eval {'bf16' if bf16 else 'f32'}: "
          f"{dt/ITERS*1e3:.1f} ms/frame")
