#!/usr/bin/env bash
# Reverse distillation: Res18 teachers -> Swin-L student
# (reference MT4MTLKD/Scripts/test_fold1_res2swin.sh configuration).
# Prereq: Res18 single-task feats + Res18TCN preds on the feature bus.
set -euo pipefail
DATA=${1:?usage: $0 DATA_DIR [FOLD]}
FOLD=${2:-1}
python -m computervision_codes_tpu.cli.spatial_transformer -t -e \
    --data_dir "$DATA" -k "$FOLD" --loss_type all --rates 1 1 1 \
    --backbone swin_L_384_22k --teacher_dim 512 \
    --teacher_feat_version Res18 --teacher_pred_version Res18TCN \
    --version res2swin
