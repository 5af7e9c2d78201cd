#!/bin/bash
# Round-5 TPU queue C: the training debt (VERDICT r5 task #2), attempt 2
# of the day.  Strategy change from the blanket probe_train retry: bisect
# WHICH cascade stage makes the train-step compile explode on the remote
# helper (4 dated 50-60 min timeouts since r4 vs 8-9 min inference
# modules), with per-stage timeouts so one bomb doesn't eat the queue.
# Serialized; run SOLO on the chip.
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. bisect: stereo-only train step =="
timeout 2400 python scripts/compile_bisect_train.py stereo \
    > $L/bisect_stereo.log 2>&1
echo "bisect_stereo rc=$?"

echo "== 2. bisect: stereo+motion train step =="
timeout 5400 python scripts/compile_bisect_train.py motion \
    > $L/bisect_motion.log 2>&1
echo "bisect_motion rc=$?"

echo "== 3. bisect: full train step (generous budget) =="
timeout 7200 python scripts/compile_bisect_train.py full \
    > $L/bisect_full.log 2>&1
FULL_RC=$?
echo "bisect_full rc=$FULL_RC"

if [ "$FULL_RC" != "0" ]; then
  echo "== 3b. fallback: full train step, windowed splat =="
  timeout 5400 python scripts/compile_bisect_train.py full --window-splat \
      > $L/bisect_full_window.log 2>&1
  echo "bisect_full_window rc=$?"
fi

echo "== 4. recipe-scale sweep (warm cache if step 3 passed) =="
timeout 3600 python scripts/probe_train.py 1 4 8 > $L/train_f32_c.log 2>&1
echo "train_f32_c rc=$?"
timeout 3600 python scripts/probe_train.py 1 8 --bf16 \
    > $L/train_bf16_c.log 2>&1
echo "train_bf16_c rc=$?"

echo "== 5. bf16 inference accuracy (VERDICT #4, r2 debt) =="
# 250 steps: loss plateaus ~step 200 (queue-A log), and 400 steps +
# the 320x576 cascade compile blew the 3000 s budget on 2026-08-19.
timeout 5400 python scripts/validate_bf16.py --train-steps 250 \
    > $L/validate_bf16.log 2>&1
echo "validate_bf16 rc=$?"

echo "QUEUE C DONE"
