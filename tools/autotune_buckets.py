"""Autotune the bucketed-training envelope for a corpus on this chip.

Picks work-optimal bucket edges (data/batching.py choose_buckets, the
exact DP over the corpus length histogram), then probes the real train
step on-device for each (bucket, candidate batch size) pair and emits
ready-to-paste flags:

    --length_buckets 9,12,...,40 --bucket_sizes 9:512,12:256

This operationalizes the reference's manual ``--length_to_size`` dict
(cliora/data/dataloader.py:27-38) as a measurement: short buckets are
dispatch-floor-bound and run up to ~2.5x the per-sentence throughput at
B=512, long buckets regress past B=128 (BASELINE.md round-4 sweeps) --
where the crossover sits depends on the corpus mix and model config, so
measure it.

Each probe runs in a fresh subprocess (an OOM can poison the TPU
client) and costs one compile (~30-90 s over this environment's TPU
tunnel, persisted by the compilation cache).  Larger-than-default batch
sizes change the SGD batch at those lengths (a different optimization
schedule from reference-parity dynamics): the tool only recommends an
upsize when it wins by >= --min_gain (default 5%), and says so.

Usage:
    python tools/autotune_buckets.py [--cliora] [--n_buckets 10]
        [--batch_candidates 128,256,512] [--sentences 20000]
        [--lengths_file path]   # one sentence length per line
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V, D, E, KNEG, R, F = 10000, 400, 1024, 100, 36, 2048


def probe_one(spec: dict) -> dict:
    """Child mode: time the (B, L) train step, print one JSON line."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.ops.chart_pass import remat_enabled
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    B, L, K = spec["B"], spec["L"], spec["steps_per_call"]
    cliora = spec["cliora"]
    cfg = ModelConfig(size=D, input_size=E, compute_dtype="bfloat16",
                      use_obj=cliora, remat="auto",
                      remat_frac=spec["remat_frac"])
    tc = TrainConfig(lr=5e-4, k_neg=KNEG, emb_trainable=True,
                     vg_loss=cliora, use_contr=cliora,
                     attn_impl="pallas" if cliora else "einsum")
    trainer = Trainer.build(cfg, tc, V, seed=0)

    rs = np.random.RandomState(0)
    dev = {
        "sentences": jnp.asarray(rs.randint(2, V, (B, L))),
        "neg_samples": jnp.asarray(rs.choice(V, KNEG, replace=False)),
        "lengths": jnp.full((B,), L, jnp.int32),
    }
    if cliora:
        dev["obj_feats"] = jnp.asarray(rs.randn(B, R, F).astype(np.float32))
    group = [dev] * K

    ms = trainer.steps(group)                  # compile + warm
    float(ms[-1]["total_loss"])                # tunnel-safe sync
    t0 = time.time()
    for _ in range(spec["timed_calls"]):
        ms = trainer.steps(group)
    float(ms[-1]["total_loss"])
    dt = (time.time() - t0) / (spec["timed_calls"] * K)
    return {"B": B, "L": L, "ms_per_step": round(dt * 1e3, 2),
            "sents_per_sec": round(B / dt, 1),
            "remat": bool(remat_enabled(cfg, B, L, D))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", help="child mode: JSON spec")
    ap.add_argument("--n_buckets", default=10, type=int)
    ap.add_argument("--batch", default=128, type=int,
                    help="default / reference-parity batch size")
    ap.add_argument("--batch_candidates", default="128,256,512")
    ap.add_argument("--min_gain", default=0.05, type=float,
                    help="recommend a non-default batch size only when "
                         "it beats the default by this fraction")
    ap.add_argument("--cliora", action="store_true")
    ap.add_argument("--steps_per_call", default=10, type=int)
    ap.add_argument("--timed_calls", default=3, type=int)
    ap.add_argument("--remat_frac", default=0.85, type=float)
    ap.add_argument("--sentences", default=20000, type=int)
    ap.add_argument("--min_len", default=5, type=int)
    ap.add_argument("--max_len", default=40, type=int)
    ap.add_argument("--lengths_file", default=None,
                    help="corpus length histogram: one int per line "
                         "(default: the caption-like synthetic mix)")
    args = ap.parse_args()

    if args.probe:
        print(json.dumps(probe_one(json.loads(args.probe))))
        return

    from cliora_tpu.data.batching import BatchIterator, choose_buckets
    from cliora_tpu.data.sampler import NegativeSampler
    from cliora_tpu.utils.tpu_probe import tpu_reachable

    if not tpu_reachable():
        print(json.dumps({"error": "TPU tunnel unreachable; not running"}))
        return

    rs = np.random.RandomState(0)
    if args.lengths_file:
        lengths = np.loadtxt(args.lengths_file, dtype=int)
        lengths = lengths[(lengths >= 2)]
    else:
        from bench_bucketed import sample_lengths
        lengths = sample_lengths(args.sentences, args.min_len,
                                 args.max_len, rs)
    buckets = choose_buckets(lengths, args.n_buckets, policy="work")
    cands = sorted({int(b) for b in args.batch_candidates.split(",")}
                   | {args.batch})
    print(f"work-optimal edges: {buckets}; probing B in {cands} "
          f"({len(buckets) * len(cands)} probes, one compile each)",
          flush=True)

    results = {}          # (L, B) -> probe dict | None (OOM/error)
    for L in buckets:
        for B in cands:
            spec = {"B": B, "L": L, "cliora": args.cliora,
                    "steps_per_call": args.steps_per_call,
                    "timed_calls": args.timed_calls,
                    "remat_frac": args.remat_frac}
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--probe", json.dumps(spec)],
                    capture_output=True, text=True, timeout=1200)
                line = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")]
                results[(L, B)] = json.loads(line[-1]) if line else None
            except (subprocess.TimeoutExpired, json.JSONDecodeError):
                results[(L, B)] = None
            got = results[(L, B)]
            print(f"  L<={L} B={B}: "
                  + (f"{got['ms_per_step']} ms, {got['sents_per_sec']} "
                     f"sents/s, remat={got['remat']}" if got
                     else "failed (OOM or timeout)"), flush=True)

    # pick per-bucket batch: default unless a candidate wins by min_gain
    chosen, upsized = {}, []
    for L in buckets:
        base = results.get((L, args.batch))
        best_B, best = args.batch, base
        for B in cands:
            r = results.get((L, B))
            if r and (best is None
                      or r["sents_per_sec"] > best["sents_per_sec"]):
                best_B, best = B, r
        if (base and best_B != args.batch
                and best["sents_per_sec"]
                < base["sents_per_sec"] * (1 + args.min_gain)):
            best_B, best = args.batch, base     # not worth the dynamics
        chosen[L] = best_B
        if best_B != args.batch:
            upsized.append(L)

    # project corpus throughput with the chosen sizes: re-run the real
    # sampler so per-bucket batch counts reflect the new batch sizes
    length_to_size = {}
    prev = 0
    for L in buckets:
        for n in range(prev + 1, L + 1):
            length_to_size[n] = chosen[L]
        prev = L
    dataset = [(i, rs.randint(2, V, n).tolist(),
                np.zeros(1, np.float32), np.zeros(1, np.float32), 0)
               for i, n in enumerate(lengths)]
    sampler = NegativeSampler(np.ones(V) / V)
    sampler.set_seed(1)
    it = BatchIterator(dataset, negative_sampler=sampler, k_neg=KNEG,
                       batch_size=args.batch, include_partial=False,
                       length_buckets=list(buckets), prefetch=0,
                       length_to_size=length_to_size)
    n_batches, n_sents = {}, 0
    for bm in it.get_iterator(random_seed=0):
        Lp = bm["padded_length"]
        n_batches[Lp] = n_batches.get(Lp, 0) + 1
        n_sents += bm["batch_size"]
    epoch_s = sum(n * results[(L, chosen[L])]["ms_per_step"] / 1e3
                  for L, n in n_batches.items()
                  if results.get((L, chosen[L])))
    projected = round(n_sents / epoch_s, 1) if epoch_s else None

    bucket_sizes = ",".join(f"{L}:{chosen[L]}" for L in upsized)
    flags = f"--n_length_buckets {args.n_buckets}"
    flags += f" --length_buckets {','.join(str(b) for b in buckets)}"
    if bucket_sizes:
        flags += f" --bucket_sizes {bucket_sizes}"
    print(json.dumps({
        "metric": "autotuned_projected_sents_per_sec_per_chip",
        "value": projected,
        "unit": "sentences/sec/chip",
        "buckets": list(map(int, buckets)),
        "chosen_batch": {int(L): int(chosen[L]) for L in buckets},
        "flags": flags,
        "note": ("upsized buckets change the SGD batch at those lengths "
                 "(not reference-parity dynamics)" if upsized else
                 "default batch won everywhere"),
    }))


if __name__ == "__main__":
    main()
