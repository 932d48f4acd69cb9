#!/usr/bin/env bash
# MT4MTLKD full-stack fold recipe (reference MT4MTLKD/Scripts/train_fold1.sh).
# Stage order: 3 spatial Q2L teachers -> dump -> 3 MS-TCT temporal teachers
# -> dump preds -> KD student -> dump -> temporal TCN student.
#
# Usage: scripts/mt4mtlkd_train_fold.sh <DATA_DIR> [FOLD] [EPOCHS]
# Env overrides (used by scripts/networked_parity_kit.sh):
#   PRETRAIN_DIR  — Pretrain/ dir of official ImageNet .pth files; teachers
#                   and the student warm-start from it (--imagenet_pretrain)
#   BACKBONE      — teacher backbone (default swin_L_384_22k)
#   TCN_EPOCHS    — temporal student epochs (default 1000)
#   EXTRA_FLAGS   — appended to every driver call (e.g. smoke-scale dims)
set -euo pipefail
DATA=${1:?usage: $0 DATA_DIR [FOLD] [EPOCHS]}
FOLD=${2:-1}
EPOCHS=${3:-100}
BACKBONE=${BACKBONE:-swin_L_384_22k}
TCN_EPOCHS=${TCN_EPOCHS:-1000}
EXTRA_FLAGS=${EXTRA_FLAGS:-}
PRETRAIN=${PRETRAIN_DIR:+--imagenet_pretrain "$PRETRAIN_DIR"}
PY="python -m computervision_codes_tpu.cli"

for T in i v t; do
  $PY.spatial_transformer -t -e -d --data_dir "$DATA" -k "$FOLD" \
      --loss_type "$T" --epochs "$EPOCHS" --backbone "$BACKBONE" \
      --version Q2L $PRETRAIN $EXTRA_FLAGS
done

for T in i v t; do
  $PY.temporal_mstct -t -e -d --data_dir "$DATA" -k "$FOLD" \
      --loss_type "$T" --epochs "$EPOCHS" --feats_version Q2L \
      --version Q2LMSTCT -b 31 $EXTRA_FLAGS
done

$PY.spatial_cnn -t -e -d --data_dir "$DATA" -k "$FOLD" --loss_type all \
    --rates 1 1 1 --teacher_feat_version Q2L --teacher_pred_version Q2LMSTCT \
    --epochs "$EPOCHS" --version Res18 $PRETRAIN $EXTRA_FLAGS

$PY.temporal_tcn -t -e --data_dir "$DATA" -k "$FOLD" --feats_version Res18 \
    --mask --epochs "$TCN_EPOCHS" --seed 19991111 --version Res18TCN \
    $EXTRA_FLAGS
