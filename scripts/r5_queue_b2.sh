#!/bin/bash
# Round-5 queue B2: re-gate the FIXED fused GN kernel (norms outside the
# score dot, a3f0dda) and, only if green, bench it at model scale.
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. GATE: fused GN kernel on-chip equality (fixed kernel) =="
timeout 1800 python scripts/check_gn_fused_tpu.py > $L/gate_gn2.log 2>&1
GN_RC=$?
echo "gate_gn2 rc=$GN_RC"

if [ "$GN_RC" = "0" ]; then
  echo "== 2. bench A/B: fused GN =="
  timeout 3000 python bench.py --gn-impl fused --iters 40 > $L/bench_gnf.log 2>&1
  echo "bench_gnf rc=$?"

  echo "== 3. probe: fused GN per-iter (diagnostic) =="
  timeout 1800 python scripts/probe_gn_fused.py > $L/probe_gn.log 2>&1
  echo "probe_gn rc=$?"
fi

echo "QUEUE B2 DONE"
