#!/usr/bin/env bash
# Small-scale TERL smoke recipe (reference runT_debug.sh equivalent):
# nano backbone, tiny queue, 2 epochs — for pipeline validation only.
set -euo pipefail
DATA=${1:?usage: $0 DATA_DIR [FOLD]}
FOLD=${2:-1}
python -m computervision_codes_tpu.cli.terl_learnt -t -e -d \
    --data_dir "$DATA" -k "$FOLD" --backbone swin_nano_64 --img_size 64 \
    --mlp --moco_k 64 --w_epoch 1 --epochs 2 -b 8 -l 1e-5 1e-5 1e-5 \
    --version TERLdebug
python -m computervision_codes_tpu.cli.temporal_tcn -t -e \
    --data_dir "$DATA" -k "$FOLD" --feats_version TERLdebug --dedup_black \
    --epochs 2 --num_layers_PG 3 --num_layers_R 2 --num_f_maps 16 \
    --version TERLdebugTCN
