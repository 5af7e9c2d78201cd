#!/bin/bash
# Round-5 queue G (session 4): the gn_unroll A/Bs + splat post-sort
# attribution.  Benches decide; probes only diagnose.
# Serialized; run SOLO on the chip, AFTER queue F.
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. bench A/B: gn_unroll=4 =="
timeout 3000 python bench.py --gn-unroll 4 --iters 40 \
    > $L/bench_unroll4.log 2>&1
echo "bench_unroll4 rc=$?"

echo "== 2. bench A/B: bf16 x gn_unroll=4 =="
timeout 3000 python bench.py --bf16 --gn-unroll 4 --iters 40 \
    > $L/bench_bf16_unroll4.log 2>&1
echo "bench_bf16_unroll4 rc=$?"

echo "== 3. probe: splat post-sort sections + cumsum variants =="
timeout 2400 python scripts/probe_splat_postsort.py \
    > $L/probe_postsort.log 2>&1
echo "probe_postsort rc=$?"

echo "== 4. bench A/B: gn_unroll=16 (compile-risk: bigger module) =="
timeout 3000 python bench.py --gn-unroll 16 --iters 40 \
    > $L/bench_unroll16.log 2>&1
echo "bench_unroll16 rc=$?"

echo "QUEUE G DONE"

echo "== 5. reference-protocol number: 512x640 frame-0, 200 iters =="
timeout 3000 python benchmark_speed.py > $L/bench_ref_protocol.log 2>&1
echo "bench_ref_protocol rc=$?"

echo "QUEUE G REALLY DONE"
