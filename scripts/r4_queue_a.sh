#!/bin/bash
# Round-4 TPU measurement queue A: the profile probes that inform this
# round's structural optimizations.  Serialized — never run two TPU jobs
# at once (axon compile helper OOMs under contention; BENCH_NOTES).
set -x
cd /root/repo || exit 1
L=/tmp/r4
mkdir -p $L

echo "== 1. module-level profile refresh =="
timeout 1800 python scripts/profile_modules.py > $L/modules.log 2>&1
echo "modules rc=$?"

echo "== 2. stereo per-stage =="
timeout 1800 python scripts/probe_stereo_stages.py > $L/stereo_stages.log 2>&1
echo "stereo_stages rc=$?"

echo "== 3. GN bf16-scores A/B =="
timeout 1200 python scripts/probe_gn_scores.py > $L/gn_scores.log 2>&1
echo "gn_scores rc=$?"

echo "== 4. splat per-stage =="
timeout 1200 python scripts/probe_splat_stages.py > $L/splat_stages.log 2>&1
echo "splat_stages rc=$?"

echo "== 5. donation repro =="
timeout 1200 python scripts/repro_donation.py --train --carry > $L/donation.log 2>&1
echo "donation rc=$?"

echo "QUEUE A DONE"
