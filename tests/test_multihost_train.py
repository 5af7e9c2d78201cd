"""Multi-host TRAINING: 2-process jax.distributed CPU test of the sharded
train step (the DDP-equivalent signal; reference apis/train.py:43-47 wraps
DDP and relies on NCCL gradient allreduce — here XLA inserts the psum).

Each process contributes a 2-sample local shard of a global batch of 4
over a 2-process x 2-local-device mesh, runs one jitted train step, and
checks the replicated post-update params (and loss/grad logs) are
bit-identical across hosts — i.e. the gradient all-reduce really ran.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local per process

    import numpy as np
    import jax.numpy as jnp
    import optax
    from codd_tpu.losses.assembly import LossConfig
    from codd_tpu.models.codd import CODD
    from codd_tpu.parallel.mesh import make_mesh, shard_batch
    from codd_tpu.train.optim import make_optimizer
    from codd_tpu.train.trainer import create_train_state, make_train_step

    GB, T, H, W = 4, 2, 64, 64
    model = CODD(max_disp=16, iters=1, motion_type="none",
                 fusion_type="none")
    rng = np.random.RandomState(0)  # same seed on both hosts
    gbatch = {
        "l_img": rng.rand(GB, T, H, W, 3).astype(np.float32),
        "r_img": rng.rand(GB, T, H, W, 3).astype(np.float32),
        "gt_disp": (rng.rand(GB, T, H, W, 1) * 10 + 2).astype(np.float32),
        "intrinsics": np.asarray([[100.0, 100.0, W / 2, H / 2]] * GB,
                                 np.float32),
    }
    # per-host shard: host 0 takes samples [0:2], host 1 [2:4]
    local = {k: v[pid * 2:(pid + 1) * 2] for k, v in gbatch.items()}

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, H, W, 3)),
        jnp.zeros((1, T, H, W, 3)),
        jnp.asarray([[100.0, 100.0, W / 2, H / 2]], jnp.float32))
    tx = make_optimizer(lambda s: 1e-3, 1.0, params=params,
                        frozen_prefixes=[])
    state = create_train_state(params, tx)
    step = make_train_step(model, tx, LossConfig(max_disp=16,
                                                 disp_range=(1.0, 210.0)))
    mesh = make_mesh()
    with mesh:
        sharded = shard_batch(local, mesh)
        new_state, logs = step(state, sharded)
        loss = float(logs["loss"])
        gnorm = float(logs["grad_norm"])
    assert np.isfinite(loss) and np.isfinite(gnorm), (loss, gnorm)
    # params are replicated: fetching them is host-local; a content hash
    # printed by both processes must match (grad psum made updates global)
    leaves = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    digest = float(sum(np.abs(l).sum() for l in leaves))
    print(f"TRAIN_OK pid={pid} loss={loss:.6f} gnorm={gnorm:.6f} "
          f"digest={digest:.6f}")
""")


@pytest.mark.skipif(os.environ.get("CODD_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: os.environ[k] for k in ("PATH", "HOME", "TMPDIR", "LANG")
           if k in os.environ}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.getcwd() + os.pathsep
                         + os.environ.get("PYTHONPATH", ""))

    def launch(i):
        return subprocess.Popen([sys.executable, str(worker), str(i), port],
                                env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    import time

    p0 = launch(0)
    time.sleep(3.0)
    procs = [p0, launch(1)]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    import re

    stats = {}
    for out in outs:
        m = re.search(r"TRAIN_OK pid=(\d) loss=([\d.eE+-]+) "
                      r"gnorm=([\d.eE+-]+) digest=([\d.eE+-]+)", out)
        assert m, out
        stats[m.group(1)] = (m.group(2), m.group(3), m.group(4))
    assert stats["0"] == stats["1"], stats
