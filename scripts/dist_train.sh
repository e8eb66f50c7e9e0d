#!/bin/bash
# Parity shim for the reference's tools/dist_train.sh (torch.distributed.launch).
# Under single-controller JAX there is nothing to launch per-device: one
# process drives every addressable chip; multi-host pods call
# cp2_tpu.parallel.initialize() internally.
CONFIG=$1
shift
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
PYTHONPATH="$REPO:${PYTHONPATH:-}" exec python "$REPO/tools/train.py" "$CONFIG" "$@"
