#!/usr/bin/env bash
# Evaluate a DIORA checkpoint: parse F1 on flickr_test (text-only).
# TPU equivalent of the reference's test_diora.sh.
set -euo pipefail

EXP_PATH=${EXP_PATH:-./outputs/flickr/flickr_diora_eval}
DATA=${DATA:-./flickr_data}
CKPT=${CKPT:?set CKPT=path/to/model.epoch_N.npz (or reference .pt)}

python -m cliora_tpu.scripts.parse_diora \
    --batch_size 64 \
    --emb none \
    --hidden_dim 400 \
    --data_type flickr \
    --validation_path "$DATA/flickr_test.json" \
    --experiment_path "$EXP_PATH" \
    --load_model_path "$CKPT" \
    --postprocess \
    "$@"
