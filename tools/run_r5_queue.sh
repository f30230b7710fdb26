#!/bin/bash
# Round-5 queued TPU measurements (run serially; the 1-core host and
# the single tunnel chip both punish concurrency).  Writes logs to
# $OUT.  Each step is capped; a wedged tunnel can't take the queue
# down with it.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r5_queue}
mkdir -p "$OUT"

run() { # name, timeout_s, cmd...
  local name=$1 cap=$2; shift 2
  echo "=== $name: $(date)" | tee -a "$OUT/summary.log"
  timeout --kill-after=60 "$cap" "$@" >"$OUT/$name.log" 2>&1
  echo "--- $name rc=$? $(date)" | tee -a "$OUT/summary.log"
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 1. Full-coverage CLI run (the NEW --include_partial/--pad_batches
#    plumbing) -- 3 epochs, mixed L<=40 corpus, production envelope.
#    Compiles are already cached from the 19328-coverage run except the
#    padded-partial shapes (padded to full B: none new expected).
run cli_full_coverage 2700 python -m cliora_tpu.scripts.train \
  --data_type txt --emb none \
  --train_path /tmp/mix40/train.txt --validation_path /tmp/mix40/valid.txt \
  --experiment_path /tmp/exp_cli_full \
  --hidden_dim 400 --batch_size 128 --validation_batch_size 128 \
  --k_neg 100 --lr 5e-4 --seed 0 \
  --n_length_buckets 10 --mixed_buckets --include_partial --pad_batches \
  --steps_per_call 10 --bf16 --remat auto --eval_buckets \
  --max_epoch 3 --jax_cache_dir /tmp/jax_cache_bench

# 2. Steady-state reference measured adjacently (same tunnel weather)
#    for the CLI-vs-steady-state row.
run bench_mixed_steady 2400 python tools/bench_bucketed.py \
  --n_buckets 10 --bucket_policy work --mixed --include_partial \
  --pad_batches --steps_per_call 10

# 3. CLIORA grounding rehearsal at the FULL production config
#    (VERDICT r4 item 4): 10 work buckets + pallas span-region + bf16
#    + mixed full-coverage composition.  Quality bar: the 4-bucket/
#    chunked round-2 run reached grounding R@1 0.627 / parse F1 0.672.
D=/tmp/synflickr_r5
if [ ! -f "$D/flickr_train.json" ]; then
  python tools/make_synthetic_flickr.py "$D" 2000 400 \
    >"$OUT/make_flickr.log" 2>&1
fi
run grounding_prod 5400 python -m cliora_tpu.scripts.train \
  --max_epoch 30 --seed 1234 --arch mlp --batch_size 64 \
  --emb w2v --embeddings_path "$D/glove.txt" \
  --hidden_dim 128 --k_neg 100 --log_every_batch 100 \
  --lr 1e-3 --normalize unit --reconstruct_mode softmax \
  --train_filter_length 40 --data_type flickr \
  --train_path "$D/flickr_train.json" \
  --validation_path "$D/flickr_test.json" \
  --data_path "$D" \
  --obj_feats --vg_loss --use_contr \
  --attn_impl pallas --bf16 \
  --n_length_buckets 10 --bucket_policy work \
  --mixed_buckets --include_partial --pad_batches --eval_buckets \
  --experiment_path /tmp/exp_ground_r5 \
  --jax_cache_dir /tmp/jax_cache_bench

# 4. Serving restart re-sample (healthy-window candidates).
for i in 1 2 3; do
  run serving_restart_$i 600 python -u - <<'EOF'
import time, numpy as np
t_start = time.time()
import jax
from cliora_tpu.serving import ExportedParser
p = ExportedParser("/tmp/r5_bundle", cache=True)
rs = np.random.RandomState(0)
sents = [list(rs.randint(2, 10000, 20)) for _ in range(128)]
t0 = time.time()
p.parse(sents)
print(f"init {t0 - t_start:.1f}s first-response(B=128) {time.time() - t0:.1f}s",
      flush=True)
EOF
done
echo "QUEUE DONE $(date)" | tee -a "$OUT/summary.log"
