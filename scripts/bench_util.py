"""Shared microbenchmark helpers for the real-TPU (axon tunnel) setup.

Methodology: the tunnel adds ~30 ms per dispatch+fetch round trip, so
per-op cost is measured by chaining k applications inside one jit (with a
data dependency between iterations) and differencing against the 1-chain:
per-op = (t_k - t_1) / (k - 1).  A persistent compilation cache keeps
repeated runs cheap.
"""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _run_once(fn, args):
    r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(leaf.reshape(-1)[0])


def chain_time(op, args, k=5, iters=3, verbose=False):
    """op(*args) -> tree; leaf[0][0] feeds back into args[0] each round."""
    def chained(n):
        def f(*a):
            a = list(a)
            for _ in range(n):
                r = op(*a)
                leaves = jax.tree_util.tree_leaves(r)
                a[0] = a[0] + leaves[0].reshape(-1)[:1].astype(a[0].dtype).sum()
            return a[0]
        return jax.jit(f)

    f1, fk = chained(1), chained(k)
    t0 = time.time()
    _run_once(f1, args)
    if verbose:
        print(f"  [compile1 {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    for _ in range(iters):
        _run_once(f1, args)
    t1 = (time.time() - t0) / iters
    t0 = time.time()
    _run_once(fk, args)
    if verbose:
        print(f"  [compile{k} {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    for _ in range(iters):
        _run_once(fk, args)
    tk = (time.time() - t0) / iters
    return (tk - t1) / (k - 1) * 1e3
