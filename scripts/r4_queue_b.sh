#!/bin/bash
# Round-4 TPU queue B: propagation attribution, fixed GN kernel, new
# corr/splat backends at full-model scale.  Serialized (BENCH_NOTES).
set -x
cd /root/repo || exit 1
L=/tmp/r4
mkdir -p $L

echo "== 1. propagation sub-stages =="
timeout 2400 python scripts/probe_prop_stages.py > $L/prop_stages.log 2>&1
echo "prop_stages rc=$?"

echo "== 2. GN pallas_window (fixed) =="
timeout 1800 python scripts/probe_gn_scores.py pallas_window > $L/gn_pallas.log 2>&1
echo "gn_pallas rc=$?"

echo "== 3. quarter-res pallas splat compile check =="
timeout 900 python scripts/probe_splat_pallas_q.py > $L/splat_q.log 2>&1
echo "splat_q rc=$?"

echo "== 4. bench corr volume_pallas =="
timeout 2400 python bench.py --corr-impl volume_pallas --iters 30 > $L/bench_corr.log 2>&1
echo "bench_corr rc=$?"

echo "== 5. bench splat pallas (full-res) =="
timeout 2400 python bench.py --splat-impl pallas --iters 30 > $L/bench_splat.log 2>&1
echo "bench_splat rc=$?"

echo "QUEUE B DONE"
