"""Headline benchmark: CLIORA training throughput, sentences/sec/chip.

Workload matches the reference CLIORA Flickr training envelope
(BASELINE.md): full train step (inside-outside chart + CKY-capable
forward, reconstruction + VG + contrastive losses, backward, clip, Adam)
at B=32, L=20, D=400, k_neg=100, 36 regions x 2048 features.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "sentences/sec/chip",
   "vs_baseline": N}

``vs_baseline`` divides by the reference PyTorch implementation measured
on this host (tools/measure_reference_baseline.py; the reference repo
publishes no numbers and this environment has no CUDA -- see BASELINE.md
for caveats).
"""

import json
import time

import jax
import numpy as np

# reference torch implementation, same workload, this host's CPU
# (tools/measure_reference_baseline.py, 2026-08-16): 2.11 sentences/sec
BASELINE_SENTS_PER_SEC = 2.11

B, L, D, E, V, K, R, F = 32, 20, 400, 1024, 10000, 100, 36, 2048
WARMUP, STEPS = 3, 20


def main():
    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=R,
                      obj_feat_size=F)
    tc = TrainConfig(lr=5e-4, k_neg=K, vg_loss=True, use_contr=True,
                     emb_trainable=True)
    trainer = Trainer.build(cfg, tc, V, seed=0)

    rs = np.random.RandomState(0)
    batch = {
        "sentences": rs.randint(0, V, (B, L)),
        "neg_samples": rs.choice(V, K, replace=False),
        "obj_feats": rs.randn(B, R, F).astype(np.float32),
    }

    for i in range(WARMUP):
        trainer.step(batch, rng=jax.random.PRNGKey(i))
    jax.block_until_ready(trainer.state.params)

    t0 = time.time()
    for i in range(STEPS):
        trainer.step(batch, rng=jax.random.PRNGKey(WARMUP + i))
    jax.block_until_ready(trainer.state.params)
    dt = time.time() - t0

    sps = B * STEPS / dt
    print(json.dumps({
        "metric": "cliora_train_sentences_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "sentences/sec/chip",
        "vs_baseline": round(sps / BASELINE_SENTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
