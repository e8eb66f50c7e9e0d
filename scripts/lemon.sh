#!/bin/bash
# Lemon defect dataset (reference scripts/lemon.sh): 512^2 CSV layout, 12 classes.
source "$(dirname "$0")/common.sh"
IMG_DIR="${IMG_DIR:?}"; MASK_DIR="${MASK_DIR:?}"
preflight
pretrain --run_id cp2-lemon --data_dirs "$DATA_DIR" --lemon_data \
  --pretrain_type CP2 --epochs "${EPOCHS:-200}" -b "${BATCH:-32}" --cap_queue
finetune_sweep cp2-lemon --img_dirs "$IMG_DIR" --mask_dirs "$MASK_DIR" \
  --lemon_data --pretrain_type CP2 --pretrain_path "$LOG_DIR/cp2-lemon"
