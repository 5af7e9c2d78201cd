#!/bin/bash
# Round-5 queue E: bench-level A/Bs for the session's two new XLA-level
# variants (benches decide; probes only diagnose):
#   1. --tile-warp grouped       (row-anchored 4px group gathers)
#   2. --corr-impl volume_reduce (VPU compare-select corr columns)
#   3. combined (only meaningful if 1 or 2 wins; cheap to just run)
#   4. standalone tile-warp ranking (diagnostic, after the benches)
# Serialized; run SOLO on the chip.
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. bench A/B: grouped tile warp =="
timeout 3000 python bench.py --tile-warp grouped --iters 40 \
    > $L/bench_grouped.log 2>&1
echo "bench_grouped rc=$?"

echo "== 2. bench A/B: corr volume_reduce =="
timeout 3000 python bench.py --corr-impl volume_reduce --iters 40 \
    > $L/bench_corr_reduce.log 2>&1
echo "bench_corr_reduce rc=$?"

echo "== 3. bench A/B: combined =="
timeout 3000 python bench.py --tile-warp grouped \
    --corr-impl volume_reduce --iters 40 > $L/bench_combo.log 2>&1
echo "bench_combo rc=$?"

echo "== 4. probe: tile-warp ranking =="
timeout 1800 python scripts/probe_tilewarp.py exact grouped grouped16 \
    > $L/probe_grouped.log 2>&1
echo "probe_grouped rc=$?"

echo "QUEUE E DONE"
