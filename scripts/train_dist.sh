#!/usr/bin/env bash
# Multi-host TPU training launcher (reference scripts/train_dist.sh analogue).
#
# On GPU the reference spawns one process per device with
# torch.distributed.launch; on TPU pods the runtime is single-controller
# SPMD: run the SAME command on every host (e.g. via `gcloud compute tpus
# tpu-vm ssh --worker=all`) and jax.distributed initializes from the TPU
# environment automatically.
#
# Usage: ./scripts/train_dist.sh CONFIG [extra train.py args...]
set -euo pipefail
CONFIG=$1
shift
python "$(dirname "$0")/../train.py" "$CONFIG" "$@"
