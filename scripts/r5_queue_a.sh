#!/bin/bash
# Round-5 TPU queue A: VERDICT r4 items #1 (multi-stream serving
# throughput — the one untested lever) and #2 (the recipe-scale training
# sweep, 3 rounds outstanding).  Serialized — never run two TPU jobs at
# once (axon compile helper OOMs under contention; BENCH_NOTES).
set -x
cd /root/repo || exit 1
L=/tmp/r5
mkdir -p $L

echo "== 1. bench control (defaults, warm cache — drift control) =="
timeout 2400 python bench.py --iters 40 > $L/bench_b1.log 2>&1
echo "bench_b1 rc=$?"

echo "== 2. bench batch=2 f32 =="
timeout 3000 python bench.py --batch 2 --iters 40 > $L/bench_b2.log 2>&1
echo "bench_b2 rc=$?"

echo "== 3. bench batch=4 f32 =="
timeout 3000 python bench.py --batch 4 --iters 30 > $L/bench_b4.log 2>&1
echo "bench_b4 rc=$?"

echo "== 4. bench batch=8 f32 =="
timeout 3600 python bench.py --batch 8 --iters 20 > $L/bench_b8.log 2>&1
echo "bench_b8 rc=$?"

echo "== 5. bench bf16 b1 (control for 6.60 r3 number) =="
timeout 2400 python bench.py --bf16 --iters 40 > $L/bench_bf16_b1.log 2>&1
echo "bench_bf16_b1 rc=$?"

echo "== 6. bench batch=8 bf16 =="
timeout 3600 python bench.py --batch 8 --bf16 --iters 20 > $L/bench_bf16_b8.log 2>&1
echo "bench_bf16_b8 rc=$?"

echo "== 7. training sweep f32 B=1,4,8 (queue D debt; donate=True) =="
timeout 3600 python scripts/probe_train.py 1 4 8 > $L/train_f32.log 2>&1
echo "train_f32 rc=$?"

echo "== 8. training sweep bf16 B=1,8 =="
timeout 3600 python scripts/probe_train.py 1 8 --bf16 > $L/train_bf16.log 2>&1
echo "train_bf16 rc=$?"

echo "== 9. bf16 inference accuracy validation =="
timeout 3000 python scripts/validate_bf16.py > $L/validate_bf16.log 2>&1
echo "validate_bf16 rc=$?"

echo "QUEUE A DONE"
