#!/bin/bash
# Round-5 queue D (session 2): the remaining chip work, prioritized.
#   1. control bench anchor (needed for every A/B today)
#   2. quarter-res Pallas splat A/B (r4 queued, never run)
#   3. training debt (VERDICT r5 #2, attempt N of the round):
#      full train-step compile first (== the B=1 f32 sweep point);
#      if green -> recipe sweep B=1/4/8 f32 + B=1/8 bf16 (donation ON);
#      if red   -> stage bisect for the diagnosis record.
#   4. bf16 inference accuracy (VERDICT r5 #4, r2 debt).
# Serialized; run SOLO on the chip.
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. control bench (session anchor) =="
timeout 3000 python bench.py --iters 40 > $L/bench_ctl.log 2>&1
echo "bench_ctl rc=$?"

echo "== 2. bench A/B: quarter-res pallas splat =="
timeout 3000 python bench.py --splat-impl-lr pallas --iters 40 \
    > $L/bench_splatlr.log 2>&1
echo "bench_splatlr rc=$?"

echo "== 3. full train-step compile (B=1 f32, == first sweep point) =="
timeout 4800 python scripts/compile_bisect_train.py full \
    > $L/bisect_full.log 2>&1
FULL_RC=$?
echo "bisect_full rc=$FULL_RC"

if [ "$FULL_RC" == "0" ]; then
  echo "== 4. recipe-scale sweep (B=1 warm from step 3) =="
  timeout 5400 python scripts/probe_train.py 1 4 8 > $L/train_f32.log 2>&1
  echo "train_f32 rc=$?"
  timeout 5400 python scripts/probe_train.py 1 8 --bf16 \
      > $L/train_bf16.log 2>&1
  echo "train_bf16 rc=$?"
else
  echo "== 4b. diagnosis bisect: stereo then motion =="
  timeout 2400 python scripts/compile_bisect_train.py stereo \
      > $L/bisect_stereo.log 2>&1
  echo "bisect_stereo rc=$?"
  timeout 3600 python scripts/compile_bisect_train.py motion \
      > $L/bisect_motion.log 2>&1
  echo "bisect_motion rc=$?"
fi

echo "== 5. bf16 inference accuracy (validate_bf16) =="
timeout 5400 python scripts/validate_bf16.py --train-steps 250 \
    > $L/validate_bf16.log 2>&1
echo "validate_bf16 rc=$?"

echo "QUEUE D DONE"
