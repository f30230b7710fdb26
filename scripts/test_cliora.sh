#!/usr/bin/env bash
# Evaluate a CLIORA checkpoint: parse F1 + phrase grounding + CCRA on
# flickr_test.  TPU equivalent of the reference's test_cliora.sh.
set -euo pipefail

EXP_PATH=${EXP_PATH:-./outputs/flickr/flickr_cliora_eval}
DATA=${DATA:-./flickr_data}
CKPT=${CKPT:?set CKPT=path/to/model.epoch_N.npz (or reference .pt)}

python -m cliora_tpu.scripts.parse \
    --batch_size 64 \
    --emb none \
    --hidden_dim 400 \
    --data_type flickr \
    --validation_path "$DATA/flickr_test.json" \
    --data_path "$DATA/flickr_feat_maf/" \
    --experiment_path "$EXP_PATH" \
    --load_model_path "$CKPT" \
    --obj_feats \
    --postprocess \
    "$@"
