#!/bin/bash
# Round-4 TPU queue D: the round-3 measurement debt (VERDICT r3 #3).
# Training it/s + peak HBM at recipe scale, bf16 inference validation,
# donation repro.  Serialized (BENCH_NOTES queue discipline).
set -x
cd /root/repo || exit 1
L=/tmp/r4
mkdir -p $L

echo "== 1. training scale f32: B=1,4,8 =="
timeout 3000 python scripts/probe_train.py 1 4 8 > $L/train_f32.log 2>&1
echo "train_f32 rc=$?"

echo "== 2. donation repro =="
timeout 1800 python scripts/repro_donation.py --train --carry > $L/donation.log 2>&1
echo "donation rc=$?"

echo "== 3. training scale bf16: B=1,8 =="
timeout 2400 python scripts/probe_train.py 1 8 --bf16 > $L/train_bf16.log 2>&1
echo "train_bf16 rc=$?"

echo "== 4. bf16 inference validation =="
timeout 3000 python scripts/validate_bf16.py > $L/validate_bf16.log 2>&1
echo "validate_bf16 rc=$?"

echo "QUEUE D DONE"
