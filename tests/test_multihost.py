"""Multi-host eval aggregation: 2-process jax.distributed CPU test.

The reference merges per-rank RunningStatsWithBuffer objects via
dist.all_gather_object + rank-0 reduce (reference apis/inference.py:146-154);
our run_inference re-merges rows with multihost_utils.process_allgather
(_merge_hosts).  This spawns two real jax.distributed CPU processes and
checks every host ends up with all sequences, and rank 0's CSV is complete.
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
    import jax
    pid, port, out_csv = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np
    from codd_tpu.apis.evaluation import METER_NAMES, SUM_NAMES
    from codd_tpu.apis.inference import _merge_hosts, summarize

    class FakeDS:
        def __len__(self):
            return 5
        def sequence_name(self, i):
            return f"seq{i}"

    width = len(METER_NAMES) + len(SUM_NAMES)
    rows = [(i, [float(i * 10 + j) for j in range(width)])
            for i in range(pid, 5, 2)]
    merged = _merge_hosts(rows, FakeDS(), 2, out_csv if pid == 0 else None)
    assert sorted(merged.buffer) == [f"seq{i}" for i in range(5)], \\
        sorted(merged.buffer)
    # deterministic merge on every host; only rank 0 dumps
    if pid == 0:
        merged.dump()
        m = summarize(merged, log=lambda *a: None)
        assert abs(m[METER_NAMES[0]] - 20.0) < 1e-6, m  # mean of 0,10,..,40
        print("MERGED_OK")
""")


@pytest.mark.skipif(os.environ.get("CODD_TPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_eval_merge(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    csv = str(tmp_path / "merged.csv")
    # minimal clean env: inherited JAX/XLA state (virtual-device XLA_FLAGS,
    # plugin/coordinator variables from the outer harness) must not leak
    # into the distributed workers
    env = {k: os.environ[k] for k in ("PATH", "HOME", "TMPDIR", "LANG")
           if k in os.environ}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.getcwd() + os.pathsep
                         + os.environ.get("PYTHONPATH", ""))
    def launch(i):
        return subprocess.Popen([sys.executable, str(worker), str(i), port,
                                 csv], env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    import time

    # process 0 hosts the coordination service: give it a head start so
    # process 1's first connect doesn't race the bind
    p0 = launch(0)
    time.sleep(3.0)
    procs = [p0, launch(1)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert "MERGED_OK" in outs[0] + outs[1], outs
    assert os.path.exists(csv)
    lines = open(csv).read().strip().splitlines()
    assert len(lines) == 7  # header + 5 sequences + mean row
    assert lines[-1].startswith("mean")
    assert [l.split(",")[0] for l in lines[1:6]] == [f"seq{i}"
                                                     for i in range(5)]
