#!/bin/bash
# Round-4 TPU queue C (this session): baseline refresh + new-backend A/Bs
# + the stage attributions that set this round's per-component budgets.
# Serialized — never run two TPU jobs at once (axon compile helper OOMs
# under contention; BENCH_NOTES).
set -x
cd /root/repo || exit 1
L=/tmp/r4
mkdir -p $L

echo "== 1. bench baseline (defaults) =="
timeout 2400 python bench.py --iters 40 > $L/bench_base.log 2>&1
echo "bench_base rc=$?"

echo "== 2. bench corr volume_pallas =="
timeout 2400 python bench.py --corr-impl volume_pallas --iters 40 > $L/bench_corrp.log 2>&1
echo "bench_corrp rc=$?"

echo "== 3. bench splat pallas (full-res) =="
timeout 2400 python bench.py --splat-impl pallas --iters 40 > $L/bench_splatp.log 2>&1
echo "bench_splatp rc=$?"

echo "== 4. GN bf16-scores A/B + pallas_window =="
timeout 1800 python scripts/probe_gn_scores.py > $L/gn_scores.log 2>&1
echo "gn_scores rc=$?"
timeout 1800 python scripts/probe_gn_scores.py pallas_window > $L/gn_pallas.log 2>&1
echo "gn_pallas rc=$?"

echo "== 5. quarter-res pallas splat compile check =="
timeout 900 python scripts/probe_splat_pallas_q.py > $L/splat_q.log 2>&1
echo "splat_q rc=$?"

echo "== 6. stereo per-stage =="
timeout 1800 python scripts/probe_stereo_stages.py > $L/stereo_stages.log 2>&1
echo "stereo_stages rc=$?"

echo "== 7. propagation sub-stages =="
timeout 2400 python scripts/probe_prop_stages.py > $L/prop_stages.log 2>&1
echo "prop_stages rc=$?"

echo "QUEUE C DONE"
