#!/bin/bash
# Shared experiment-driver plumbing (parity with the reference's scripts/*.sh
# preflight-test + sweep pattern, e.g. scripts/polyp.sh:16).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
LOG_DIR="${LOG_DIR:-/tmp/cp2_tpu_logs}"
DATA_DIR="${DATA_DIR:?set DATA_DIR to the pretrain image directory}"
mkdir -p "$LOG_DIR"

preflight() {
  # every experiment runs the test suite first (reference scripts/polyp.sh:16):
  # the fast tier plus the slow-critical gates — multi-device equivalence,
  # SSL step semantics, finetune task — which must RUN, not skip (the
  # conftest hard-fails if the 8-device CPU mesh is unavailable, so a
  # mis-configured backend cannot silently skip the gate tests).
  python -m pytest "$REPO/tests" -q -m "not slow"
  python -m pytest -q \
    "$REPO/tests/test_multichip.py" \
    "$REPO/tests/test_ssl_step.py" \
    "$REPO/tests/test_finetune_task.py"
}

preflight_full() {
  # the complete suite (slow tier included) — run routinely, e.g. nightly
  python -m pytest "$REPO/tests" -q
}

pretrain() { python -m cp2_tpu.train.pretrain --log_dir "$LOG_DIR" "$@"; }
finetune() { python -m cp2_tpu.train.finetune --log_dir "$LOG_DIR" "$@"; }
mirror()   { python -m cp2_tpu.train.mirror_pretrain --log_dir "$LOG_DIR" "$@"; }

if [ -n "${CP2_SCRIPT_DRYRUN:-}" ]; then
  # Flag-rot guard mode (tests/test_scripts_dryrun.py): echo every CLI
  # invocation instead of running it, so the test can feed each flag list
  # through the real argparse + hparam-validation web. The reference's own
  # scripts rotted this way — its lemon.sh passes flags its main.py no
  # longer accepts (--lmbd_corr_weight, mapping 'PIXEL_REGION').
  preflight() { :; }
  preflight_full() { :; }
  pretrain() { printf 'PRETRAIN\t--log_dir %s %s\n' "$LOG_DIR" "$*"; }
  finetune() { printf 'FINETUNE\t--log_dir %s %s\n' "$LOG_DIR" "$*"; }
  mirror()   { printf 'MIRROR\t--log_dir %s %s\n' "$LOG_DIR" "$*"; }
fi

finetune_sweep() {
  # ratio x seed matrix (reference sweep pattern: ratios 0.3/0.6/1, seeds 0/1/2)
  local tag="$1"; shift
  for ratio in 0.3 0.6 1.0; do
    for seed in 0 1 2; do
      finetune --run_id "${tag}-r${ratio}-s${seed}" \
        --train_data_ratio "$ratio" --seed "$seed" "$@"
    done
  done
}
