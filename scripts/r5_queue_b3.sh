#!/bin/bash
# Round-5 queue B3: gate + bench the pixel-major tile-warp kernel
# (275d897), plus the combined fused-GN + tile-warp bench if both
# kernels' gates are green (GN gate #2 passed 2026-08-19 20:00,
# rel 2.3e-4).
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. GATE: tile-warp kernel on-chip equality (pixel-major) =="
timeout 1800 python scripts/check_tile_warp_tpu.py > $L/gate_tw2.log 2>&1
TW_RC=$?
echo "gate_tw2 rc=$TW_RC"

if [ "$TW_RC" = "0" ]; then
  echo "== 2. bench A/B: tile-warp pallas =="
  timeout 3000 python bench.py --tile-warp pallas --iters 40 > $L/bench_twp.log 2>&1
  echo "bench_twp rc=$?"

  echo "== 3. bench A/B: combined fused GN + tile-warp pallas =="
  timeout 3000 python bench.py --gn-impl fused --tile-warp pallas --iters 40 \
      > $L/bench_comb.log 2>&1
  echo "bench_comb rc=$?"

  echo "== 4. probe: tile-warp kernel per-call (diagnostic) =="
  timeout 2400 python scripts/probe_tile_warp_pallas.py > $L/probe_tw.log 2>&1
  echo "probe_tw rc=$?"
fi

echo "QUEUE B3 DONE"
