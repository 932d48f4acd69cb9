#!/usr/bin/env bash
# TERL fold recipe (reference TERL/6_baseline_learnT/runT.sh): tail-enhanced
# contrastive spatial stage -> dump -> fold TCN with black-frame dedup.
#
# Usage: scripts/terl_train_fold.sh <DATA_DIR> [FOLD] [BACKBONE] [IMG]
set -euo pipefail
DATA=${1:?usage: $0 DATA_DIR [FOLD] [BACKBONE] [IMG_SIZE]}
FOLD=${2:-1}
BACKBONE=${3:-swin_T_224_1k}   # runB.sh: swin_B_384_22k + --img_size 384
IMG=${4:-224}
PY="python -m computervision_codes_tpu.cli"

$PY.terl_learnt -t -e -d --data_dir "$DATA" -k "$FOLD" \
    --backbone "$BACKBONE" --img_size "$IMG" --mlp --moco_k 16384 \
    --w_epoch 1 --train_div 2 --epochs 20 --seed 20000912 --version TERL

$PY.temporal_tcn -t -e --data_dir "$DATA" -k "$FOLD" --feats_version TERL \
    --dedup_black --epochs 1000 --seed 20000912 --version TERLTCN
