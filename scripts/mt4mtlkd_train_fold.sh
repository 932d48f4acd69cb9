#!/usr/bin/env bash
# MT4MTLKD full-stack fold recipe (reference MT4MTLKD/Scripts/train_fold1.sh).
# Stage order: 3 spatial Q2L teachers -> dump -> 3 MS-TCT temporal teachers
# -> dump preds -> KD student -> dump -> temporal TCN student.
#
# Usage: scripts/mt4mtlkd_train_fold.sh <DATA_DIR> [FOLD] [EPOCHS]
set -euo pipefail
DATA=${1:?usage: $0 DATA_DIR [FOLD] [EPOCHS]}
FOLD=${2:-1}
EPOCHS=${3:-100}
PY="python -m computervision_codes_tpu.cli"

for T in i v t; do
  $PY.spatial_transformer -t -e -d --data_dir "$DATA" -k "$FOLD" \
      --loss_type "$T" --epochs "$EPOCHS" --backbone swin_L_384_22k \
      --version Q2L
done

for T in i v t; do
  $PY.temporal_mstct -t -e -d --data_dir "$DATA" -k "$FOLD" \
      --loss_type "$T" --epochs "$EPOCHS" --feats_version Q2L \
      --version Q2LMSTCT -b 31
done

$PY.spatial_cnn -t -e -d --data_dir "$DATA" -k "$FOLD" --loss_type all \
    --rates 1 1 1 --teacher_feat_version Q2L --teacher_pred_version Q2LMSTCT \
    --epochs "$EPOCHS" --version Res18

$PY.temporal_tcn -t -e --data_dir "$DATA" -k "$FOLD" --feats_version Res18 \
    --mask --epochs 1000 --seed 19991111 --version Res18TCN
