#!/usr/bin/env bash
# Finetune CLIORA from a DIORA checkpoint on Flickr30K (MAF region
# features; contrastive + VG losses).  TPU equivalent of the reference's
# train_cliora.sh.  Accepts reference .pt or native .npz checkpoints.
set -euo pipefail

EXP_PATH=${EXP_PATH:-./outputs/flickr/flickr_cliora_1e5_mlpshare_bs32_RandInit_seed1234}
DATA=${DATA:-./flickr_data}
DIORA_CKPT=${DIORA_CKPT:-./outputs/flickr/flickr_diora_5e4_mlpshare_bs32_RandInit_seed1234/model.epoch_29.npz}

python -m cliora_tpu.scripts.train \
    --max_epoch 10 \
    --seed 1234 \
    --arch mlp \
    --batch_size 32 \
    --emb none \
    --hidden_dim 400 \
    --k_neg 100 \
    --log_every_batch 100 \
    --lr 1e-5 \
    --normalize unit \
    --reconstruct_mode softmax \
    --train_filter_length 40 \
    --data_type flickr \
    --train_path "$DATA/flickr_train.json" \
    --validation_path "$DATA/flickr_test.json" \
    --data_path "$DATA/flickr_feat_maf/" \
    --experiment_path "$EXP_PATH" \
    --obj_feats \
    --use_contr --alpha_contr 1.0 \
    --vg_loss --alpha_vg 1.0 \
    --load_model_path "$DIORA_CKPT" \
    "$@"
