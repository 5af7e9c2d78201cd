#!/bin/bash
# Round-5 queue F (session 4): bank the remaining measurable levers.
#   1. bf16 + volume_reduce combined anchor (new-best candidate; the
#      r3 bf16 number predates the adopted corr win)
#   2. training debt (VERDICT r5 #2), dated attempt: full train-step
#      compile -> recipe sweep; window-splat fallback; bisect for the
#      record if both red
#   3. bf16 inference accuracy (VERDICT r5 #4, r2 debt)
#   4. bf16 x grouped tile-warp A/B (chunk-size hypothesis: bf16 drops
#      the exact path's gather chunks to 128 B — below the fast-path
#      threshold — while grouped's stay 384 B)
# Serialized; run SOLO on the chip.
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. bench bf16 anchor (with adopted volume_reduce) =="
timeout 3000 python bench.py --bf16 --iters 40 > $L/bench_bf16.log 2>&1
echo "bench_bf16 rc=$?"

echo "== 2. full train-step compile (B=1 f32 map-init) =="
timeout 4500 python scripts/compile_bisect_train.py full \
    > $L/bisect_full3.log 2>&1
FULL_RC=$?
echo "bisect_full3 rc=$FULL_RC"
SWEEP_ARGS=""
if [ "$FULL_RC" != "0" ]; then
  echo "== 2b. fallback: window-splat train path =="
  timeout 4500 python scripts/compile_bisect_train.py full --window-splat \
      > $L/bisect_full_ws2.log 2>&1
  WS_RC=$?
  echo "bisect_full_ws2 rc=$WS_RC"
  if [ "$WS_RC" == "0" ]; then SWEEP_ARGS="--window-splat"; fi
fi
if [ "$FULL_RC" == "0" ] || [ -n "$SWEEP_ARGS" ]; then
  echo "== 3. recipe sweep f32 B=1/4/8 =="
  timeout 5400 python scripts/probe_train.py 1 4 8 $SWEEP_ARGS \
      > $L/train_f32.log 2>&1
  echo "train_f32 rc=$?"
  echo "== 4. recipe sweep bf16 B=1/8 =="
  timeout 5400 python scripts/probe_train.py 1 8 --bf16 $SWEEP_ARGS \
      > $L/train_bf16.log 2>&1
  echo "train_bf16 rc=$?"
else
  echo "TRAIN COMPILE RED TWICE (dated attempt on record)"
  echo "== 4b. diagnosis bisect: stereo stage =="
  timeout 2400 python scripts/compile_bisect_train.py stereo \
      > $L/bisect_stereo.log 2>&1
  echo "bisect_stereo rc=$?"
fi

echo "== 5. bf16 inference accuracy (validate_bf16) =="
timeout 5400 python scripts/validate_bf16.py --train-steps 250 \
    > $L/validate_bf16.log 2>&1
echo "validate_bf16 rc=$?"

echo "== 6. bench A/B: bf16 x grouped tile-warp =="
timeout 3000 python bench.py --bf16 --tile-warp grouped --iters 40 \
    > $L/bench_bf16_grouped.log 2>&1
echo "bench_bf16_grouped rc=$?"

echo "QUEUE F DONE"
