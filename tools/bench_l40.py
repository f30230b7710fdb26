"""A/B the L=40 memory levers: selective remat vs gradient accumulation.

Round-2 finding (BASELINE.md): at B=128 L=40 the full CLIORA step OOMs
without remat; blanket remat runs 370 ms and `--remat_frac 0.85` cuts it
to 317.5 ms.  Gradient accumulation (`--accum_steps`) halves activation
memory per microbatch *without recompute*, so accum=2 plausibly beats
remat wherever the halved microbatch fits (queued measurement #3,
BASELINE.md round-3 session 3).

Runs each config in a fresh subprocess (an OOM can poison the TPU
client) and prints one JSON line per config:
  {"config": ..., "ms_per_step": N | null, "error": ...}

Usage:  python tools/bench_l40.py            # all configs
        python tools/bench_l40.py --one '{"accum": 2}'   # child mode
"""

import argparse
import json
import os
import subprocess
import sys

# script-mode sys.path[0] is tools/: make the package importable in BOTH
# parent and --one child processes (cliora_tpu is not pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

B, L, D, E, V, K, R, F = 128, 40, 400, 1024, 10000, 100, 36, 2048
WARMUP, STEPS = 3, 10

CONFIGS = [
    {"name": "remat_frac_0.85", "remat": True, "remat_frac": 0.85,
     "accum": 1},
    {"name": "accum_2", "remat": False, "remat_frac": 0.0, "accum": 2},
    {"name": "accum_4", "remat": False, "remat_frac": 0.0, "accum": 4},
    {"name": "accum_2_remat_0.85", "remat": True, "remat_frac": 0.85,
     "accum": 2},
    # 'dots' residual policy: matmul outputs saved, only gathers +
    # elementwise recomputed -- more memory per checkpointed level than
    # 'full', far less recompute.  Sweep remat_frac to find the fit edge.
    {"name": "dots_frac_0.0", "remat": True, "remat_frac": 0.0,
     "accum": 1, "policy": "dots"},
    {"name": "dots_frac_0.5", "remat": True, "remat_frac": 0.5,
     "accum": 1, "policy": "dots"},
    {"name": "dots_frac_0.85", "remat": True, "remat_frac": 0.85,
     "accum": 1, "policy": "dots"},
    # 'gathers' residual policy: everything saved EXCEPT the chart-child
    # gathers (ops/chart_pass.py CHILD_RESIDS).  MEASURED NEGATIVE
    # 2026-08-19: OOM at 27.3 GB (worse than unremated 18.2) -- the
    # save-anything-except policy keeps redundant elementwise residuals
    # (pre-act + relu mask + broadcast) and the compose concat.
    {"name": "gathers_frac_0.0", "remat": True, "remat_frac": 0.0,
     "accum": 1, "policy": "gathers"},
    {"name": "gathers_text", "remat": True, "remat_frac": 0.0,
     "accum": 1, "policy": "gathers", "text": True},
]


def run_one(spec: dict) -> dict:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    text = spec.get("text", False)   # DIORA text pretrain (recon only):
    # the config of the bucketed-envelope L<=40 bucket, where gradient
    # accumulation is semantically exact (no batch-coupled losses)
    cfg = ModelConfig(size=D, input_size=E, use_obj=not text, n_regions=R,
                      obj_feat_size=F, compute_dtype="bfloat16",
                      remat=spec["remat"], remat_frac=spec["remat_frac"],
                      remat_policy=spec.get("policy", "full"))
    tc = TrainConfig(lr=5e-4, k_neg=K, vg_loss=not text,
                     use_contr=not text,
                     emb_trainable=True, attn_impl="pallas",
                     accum_steps=spec["accum"])
    trainer = Trainer.build(cfg, tc, V, seed=0)

    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(0, V, (B, L)))
    neg = jnp.asarray(rs.choice(V, K, replace=False))
    obj = jnp.asarray(rs.randn(B, R, F).astype(np.float32))
    rng = jax.random.key(0, impl="rbg")

    state = trainer.state
    for _ in range(WARMUP):
        state, metrics = trainer._train_step(state, tokens, neg, obj, rng)
    float(metrics["total_loss"])    # sync (tunnel-safe, BASELINE.md)

    t0 = time.time()
    for _ in range(STEPS):
        state, metrics = trainer._train_step(state, tokens, neg, obj, rng)
    float(metrics["total_loss"])
    dt = time.time() - t0
    return {"config": spec["name"], "ms_per_step": round(1e3 * dt / STEPS, 1),
            "sents_per_sec": round(B * STEPS / dt, 1), "error": None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", help="child mode: JSON spec for one config")
    args = ap.parse_args()
    if args.one:
        print(json.dumps(run_one(json.loads(args.one))))
        return

    from cliora_tpu.utils.tpu_probe import tpu_reachable

    if not tpu_reachable():
        print(json.dumps({"error": "TPU tunnel unreachable; not running"}))
        return

    for spec in CONFIGS:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", json.dumps(spec)],
                capture_output=True, text=True, timeout=1200)
            out = [ln for ln in r.stdout.splitlines()
                   if ln.startswith("{")]
            if r.returncode == 0 and out:
                print(out[-1])
            else:
                err = (r.stderr or "").strip().splitlines()
                tag = "OOM" if any("RESOURCE_EXHAUSTED" in ln
                                   for ln in err) else \
                    (err[-1][:200] if err else "no output")
                print(json.dumps({"config": spec["name"],
                                  "ms_per_step": None, "error": tag}))
        except subprocess.TimeoutExpired:
            print(json.dumps({"config": spec["name"], "ms_per_step": None,
                              "error": "timeout (compile service busy or "
                                       "tunnel down)"}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
