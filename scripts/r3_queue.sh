#!/bin/bash
# Round-3 serialized TPU measurement queue (never run two TPU jobs at once:
# the axon compile helper OOMs under contention — BENCH_NOTES env notes).
set -x
cd /root/repo || exit 1
L=/tmp/r3
mkdir -p $L

echo "== 1. donation repro =="
timeout 1200 python scripts/repro_donation.py --train --carry > $L/donation.log 2>&1
echo "donation rc=$?"

echo "== 2. GN bf16-scores A/B =="
timeout 900 python scripts/probe_gn_scores.py > $L/gn_scores.log 2>&1
echo "gn_scores rc=$?"

echo "== 3. training at recipe scale (f32) =="
timeout 2400 python scripts/probe_train.py 1 4 8 > $L/train_f32.log 2>&1
echo "train_f32 rc=$?"

echo "== 4. training bf16 =="
timeout 1800 python scripts/probe_train.py 4 8 --bf16 > $L/train_bf16.log 2>&1
echo "train_bf16 rc=$?"

echo "== 5. bf16 inference validation =="
timeout 2400 python scripts/validate_bf16.py > $L/bf16.log 2>&1
echo "bf16 rc=$?"
