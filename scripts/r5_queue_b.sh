#!/bin/bash
# Round-5 TPU queue B: kernel gates FIRST (the gn_window lesson: no bench
# number before the on-chip equality gate is green), then the bench-level
# A/Bs (the decision-makers), then standalone probes (diagnostics only —
# r4 lesson: standalone wins do not transfer, so they rank, never decide).
# Serialized (BENCH_NOTES discipline).
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. GATE: fused GN kernel on-chip equality =="
timeout 1800 python scripts/check_gn_fused_tpu.py > $L/gate_gn.log 2>&1
GN_RC=$?
echo "gate_gn rc=$GN_RC"

echo "== 2. GATE: tile-warp kernel on-chip equality (+ Mosaic gather probe) =="
timeout 1800 python scripts/check_tile_warp_tpu.py > $L/gate_tw.log 2>&1
TW_RC=$?
echo "gate_tw rc=$TW_RC"

echo "== 3. bench A/B: windowed splat =="
timeout 3000 python bench.py --splat-impl xla_window --iters 40 > $L/bench_splatw.log 2>&1
echo "bench_splatw rc=$?"

if [ "$GN_RC" = "0" ]; then
  echo "== 4. bench A/B: fused GN =="
  timeout 3000 python bench.py --gn-impl fused --iters 40 > $L/bench_gnf.log 2>&1
  echo "bench_gnf rc=$?"
fi

if [ "$TW_RC" = "0" ]; then
  echo "== 5. bench A/B: tile-warp pallas =="
  timeout 3000 python bench.py --tile-warp pallas --iters 40 > $L/bench_twp.log 2>&1
  echo "bench_twp rc=$?"
fi

if [ "$GN_RC" = "0" ] && [ "$TW_RC" = "0" ]; then
  echo "== 6. bench A/B: combined fused GN + tile-warp pallas =="
  timeout 3000 python bench.py --gn-impl fused --tile-warp pallas --iters 40 \
      > $L/bench_comb.log 2>&1
  echo "bench_comb rc=$?"
fi

echo "== 7. control re-run (drift anchor) =="
timeout 1800 python bench.py --iters 40 > $L/bench_ctrl2.log 2>&1
echo "bench_ctrl2 rc=$?"

echo "== 8. probe: windowed splat vs gather splat =="
timeout 1800 python scripts/probe_splat_window.py > $L/probe_splat.log 2>&1
echo "probe_splat rc=$?"

if [ "$GN_RC" = "0" ]; then
  echo "== 9. probe: fused GN per-iter =="
  timeout 1800 python scripts/probe_gn_fused.py > $L/probe_gn.log 2>&1
  echo "probe_gn rc=$?"
fi

if [ "$TW_RC" = "0" ]; then
  echo "== 10. probe: tile-warp kernel per-call =="
  timeout 2400 python scripts/probe_tile_warp_pallas.py > $L/probe_tw.log 2>&1
  echo "probe_tw rc=$?"
fi

echo "QUEUE B DONE"
