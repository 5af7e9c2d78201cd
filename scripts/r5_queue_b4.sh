#!/bin/bash
# Round-5 queue B4: (1) fresh control anchor on this session's host,
# (2) the quarter-res Pallas splat compositor A/B that r4 queued but
# never ran (--splat-impl-lr pallas; standalone 3.44 vs 5.7 ms).
# Serialized; run SOLO on the chip.
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. control bench (day/session anchor) =="
timeout 3000 python bench.py --iters 40 > $L/bench_ctl_b4.log 2>&1
echo "bench_ctl rc=$?"

echo "== 2. bench A/B: quarter-res pallas splat =="
timeout 3000 python bench.py --splat-impl-lr pallas --iters 40 \
    > $L/bench_splatlr.log 2>&1
echo "bench_splatlr rc=$?"

echo "QUEUE B4 DONE"
