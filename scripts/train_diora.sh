#!/usr/bin/env bash
# Train DIORA (text-only) on Flickr30K captions, randomly-initialized
# word embeddings.  TPU equivalent of the reference's train_diora.sh
# (4-GPU DDP launch -> single-process data-parallel over all local chips).
set -euo pipefail

EXP_PATH=${EXP_PATH:-./outputs/flickr/flickr_diora_5e4_mlpshare_bs32_RandInit_seed1234}
DATA=${DATA:-./flickr_data}

python -m cliora_tpu.scripts.train \
    --max_epoch 30 \
    --seed 1234 \
    --arch mlp \
    --batch_size 32 \
    --emb none \
    --hidden_dim 400 \
    --k_neg 100 \
    --log_every_batch 100 \
    --lr 5e-4 \
    --normalize unit \
    --reconstruct_mode softmax \
    --train_filter_length 40 \
    --data_type flickr \
    --train_path "$DATA/flickr_train.json" \
    --validation_path "$DATA/flickr_test.json" \
    --data_path "$DATA/flickr_feat_maf/" \
    --experiment_path "$EXP_PATH" \
    "$@"
