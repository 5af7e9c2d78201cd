"""Time the splat paths (xla vs pallas compositor) at KITTI-res configs."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from codd_tpu.ops.splat import splat_render


def bench(H, W, C, radius, impl, iters=10):
    rng = np.random.RandomState(0)
    N = H * W
    Z = (0.5 + rng.rand(N).astype(np.float32) * 30)
    px = rng.uniform(-1, W, N).astype(np.float32)
    py = rng.uniform(-1, H, N).astype(np.float32)
    fx = fy = 450.0
    cx, cy = W / 2, H / 2
    pts = np.stack([(px - cx) / fx * Z, (py - cy) / fy * Z, Z], -1)[None]
    feats = rng.rand(1, N, C).astype(np.float32)
    intr = jnp.asarray([[fx, fy, cx, cy]], jnp.float32)
    pts = jnp.asarray(pts)
    feats = jnp.asarray(feats)

    f = jax.jit(lambda p, ft: splat_render(p, ft, intr, H=H, W=W,
                                           radius_px=radius, impl=impl))

    def run(p):
        o, z = f(p, feats)
        return float(np.asarray(z[0, 0, 0]))

    t0 = time.time()
    run(pts)
    print(f"  [{impl} H={H} W={W} C={C} r={radius}] compile {time.time()-t0:.0f}s",
          flush=True)
    # hard-sync timing with data dependency between iterations
    t0 = time.perf_counter()
    p = pts
    for i in range(iters):
        o, z = f(p, feats)
        p = p + 1e-12 * z[0, 0, 0]
    float(np.asarray(z[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {impl}: {dt:.2f} ms", flush=True)
    return dt


if __name__ == "__main__":
    # full-res: flow(3)+conf(1); quarter-res: feat(32)
    for (H, W, C, r) in [(384, 1280, 4, 1.0), (96, 320, 32, 2.0)]:
        for impl in ("pallas", "xla"):
            bench(H, W, C, r, impl)
