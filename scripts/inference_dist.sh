#!/usr/bin/env bash
# Multi-host TPU inference launcher (reference scripts/inference_dist.sh
# analogue). Run on every host; the dataset shards by process index.
#
# Usage: ./scripts/inference_dist.sh CONFIG CHECKPOINT [extra args...]
set -euo pipefail
CONFIG=$1
CKPT=$2
shift 2
python "$(dirname "$0")/../inference.py" "$CONFIG" "$CKPT" "$@"
