"""Diagnose where bench.py's 369 ms/frame goes: python-loop dispatch vs a
single-jit lax.scan over frames, plus per-module timings via chaining."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from codd_tpu.models.codd import CODD


def main():
    H, W = 384, 1280
    model = CODD(max_disp=320, iters=16)
    rng = np.random.RandomState(0)
    NBUF = 8
    lbuf = jnp.asarray(rng.rand(NBUF, 1, H, W, 3).astype(np.float32))
    rbuf = jnp.asarray(rng.rand(NBUF, 1, H, W, 3).astype(np.float32))
    intr = jnp.asarray([[450.0, 450.0, W / 2.0, H / 2.0]], jnp.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 128, 3)), jnp.zeros((1, 2, 64, 128, 3)),
        jnp.asarray([[450.0, 450.0, 64.0, 32.0]], jnp.float32))

    first = jax.jit(lambda p, l, r, k: model.apply(p, l, r, k,
                                                   method=CODD.first_step))
    carry, _ = first(params, lbuf[0], rbuf[0], intr)

    # ---- scan over T frames inside ONE jit ----
    def make_scan(T):
        def body(c, xs):
            l, r = xs
            nc, out = model.apply(params, c, l, r, intr, method=CODD.step)
            return nc, out["pred_disp"].reshape(-1)[0]
        def f(c, l, r):
            return jax.lax.scan(body, c, (l, r))
        return jax.jit(f)

    for T in (4, 16):
        ls = jnp.concatenate([lbuf] * ((T + NBUF - 1) // NBUF))[:T]
        rs = jnp.concatenate([rbuf] * ((T + NBUF - 1) // NBUF))[:T]
        f = make_scan(T)
        c2, d = f(carry, ls, rs)
        float(d[-1])
        t0 = time.perf_counter()
        c2, d = f(carry, ls, rs)
        float(d[-1])
        dt = time.perf_counter() - t0
        print(f"scan T={T}: {dt*1e3:.1f} ms total, {dt/T*1e3:.1f} ms/frame")

    # ---- python loop dispatch (bench.py shape) ----
    step = jax.jit(lambda p, c, l, r, k: model.apply(p, c, l, r, k,
                                                     method=CODD.step),
                   donate_argnums=(1,))
    c = carry
    for i in range(3):
        c, out = step(params, c, lbuf[i % NBUF], rbuf[i % NBUF], intr)
    float(np.asarray(out["pred_disp"][0, 0, 0, 0]))
    t0 = time.perf_counter()
    N = 10
    for i in range(N):
        c, out = step(params, c, lbuf[i % NBUF], rbuf[i % NBUF], intr)
    float(np.asarray(out["pred_disp"][0, 0, 0, 0]))
    dt = time.perf_counter() - t0
    print(f"python loop: {dt/N*1e3:.1f} ms/frame")

    # dispatch cost alone: time the enqueue (no sync)
    t0 = time.perf_counter()
    for i in range(N):
        c, out = step(params, c, lbuf[i % NBUF], rbuf[i % NBUF], intr)
    dt_dispatch = time.perf_counter() - t0
    float(np.asarray(out["pred_disp"][0, 0, 0, 0]))
    print(f"dispatch only: {dt_dispatch/N*1e3:.1f} ms/frame")


if __name__ == "__main__":
    main()
