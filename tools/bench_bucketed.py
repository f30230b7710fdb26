"""Throughput at the reference's ACTUAL training envelope: bucketed
mixed-length sentences up to L=40.

The reference trains Flickr with ``--train_filter_length 40``
(/root/reference/train_diora.sh:22) over naturally mixed caption
lengths; BASELINE.md's L=20 headline measures one fixed length.  This
tool measures the full mixed-length path: a caption-like length
distribution (lognormal, clipped to [min_len, 40]), the production
masked length-bucketing machinery (data/batching.py BatchIterator with
``length_buckets``), multi-step dispatch per bucket, and '--remat auto'
(short buckets unremated at full speed, long buckets checkpointed to
fit HBM -- ops/chart_pass.remat_enabled).

Methodology: per-bucket steady-state step time is measured with
device-resident batches (the prefetch pipeline's steady state; host
uploads over this environment's TPU tunnel are not the production
bound, BASELINE.md round 3) and composed into corpus throughput by each
bucket's actual batch count from a real epoch of the sampler:

    sents/s = total_sentences / sum_b (n_batches_b * step_time_b)

Prints ONE json line.  Usage:
    python tools/bench_bucketed.py [--cliora] [--batch 128]
        [--n_buckets 4] [--sentences 20000] [--steps_per_call 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V, D, E, KNEG, R, F = 10000, 400, 1024, 100, 36, 2048


def sample_lengths(n, lo, hi, rs):
    """Caption-like length mix: lognormal(mean~13 tokens) clipped."""
    x = rs.lognormal(mean=2.55, sigma=0.45, size=n)
    return np.clip(np.round(x), lo, hi).astype(int)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--min_len", default=5, type=int)
    ap.add_argument("--max_len", default=40, type=int)
    ap.add_argument("--n_buckets", default=4, type=int)
    ap.add_argument("--bucket_policy", default="quantile",
                    choices=("quantile", "work"))
    ap.add_argument("--sentences", default=20000, type=int,
                    help="epoch size used for the bucket-mass weights")
    ap.add_argument("--steps_per_call", default=10, type=int)
    ap.add_argument("--timed_calls", default=3, type=int,
                    help="timed multi-step dispatches per bucket")
    ap.add_argument("--cliora", action="store_true",
                    help="full CLIORA step (visual losses); default is "
                         "the DIORA text pretrain envelope of "
                         "train_diora.sh")
    ap.add_argument("--bucket_sizes", default=None,
                    help="per-bucket batch sizes 'L:B,L:B,...' (padded "
                         "bucket length -> batch size); lengths not "
                         "listed keep --batch.  The production "
                         "--length_to_size lever: short buckets are "
                         "dispatch-floor-bound at B=128 and run ~2x "
                         "the throughput at B=512 (text L=10 sweep, "
                         "BASELINE.md round 4).")
    ap.add_argument("--mixed", action="store_true",
                    help="mixed-length batch composition within buckets "
                         "(--mixed_buckets): every batch holds mixed "
                         "TRUE lengths padded to its bucket edge, so no "
                         "exact length is dropped for failing to muster "
                         "a full batch.  A/B this against the default "
                         "exact-length composition.")
    ap.add_argument("--include_partial", action="store_true",
                    help="emit surplus (short) batches too; with "
                         "--pad_batches they pad to full size, so "
                         "coverage is 100%% at one program per bucket")
    ap.add_argument("--pad_batches", action="store_true")
    ap.add_argument("--remat", default="auto",
                    help="'auto' (default) | 'true' | 'false'")
    ap.add_argument("--remat_frac", default=0.85, type=float)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        from cliora_tpu.utils.tpu_probe import tpu_reachable

        if not tpu_reachable():
            print(json.dumps({"error": "TPU tunnel unreachable"}))
            return
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from cliora_tpu.data.batching import BatchIterator, choose_buckets
    from cliora_tpu.data.sampler import NegativeSampler
    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    rs = np.random.RandomState(0)
    lengths = sample_lengths(args.sentences, args.min_len, args.max_len,
                             rs)
    buckets = choose_buckets(lengths, args.n_buckets,
                             policy=args.bucket_policy)

    # the production data path: real dataset rows -> same-length sampler
    # -> bucket padding + lengths vectors (masked bucketing)
    dataset = [(i, rs.randint(2, V, n).tolist(),
                np.zeros(1, np.float32), np.zeros(1, np.float32), 0)
               for i, n in enumerate(lengths)]
    sampler = NegativeSampler(np.ones(V) / V)
    sampler.set_seed(1)
    length_to_size = None
    if args.bucket_sizes:
        per_bucket_size = {int(k): int(v) for k, v in
                           (p.split(":") for p in
                            args.bucket_sizes.split(","))}
        # map every exact length to its bucket's size so each padded
        # bucket compiles exactly one (B, L) program
        length_to_size, prev = {}, 0
        for Lb in buckets:
            sz = per_bucket_size.get(Lb, args.batch)
            for n in range(prev + 1, Lb + 1):
                length_to_size[n] = sz
            prev = Lb
    it = BatchIterator(dataset, negative_sampler=sampler, k_neg=KNEG,
                       batch_size=args.batch,
                       include_partial=args.include_partial,
                       length_buckets=buckets, prefetch=0,
                       length_to_size=length_to_size,
                       mixed_buckets=args.mixed,
                       pad_batches=args.pad_batches)

    # one real epoch: per padded-length batch counts + a representative
    # batch per bucket (shapes are identical within a bucket) + coverage
    n_batches, rep, covered = {}, {}, 0
    for bm in it.get_iterator(random_seed=0):
        key = (bm["padded_length"], bm["batch_size"])
        n_batches[key] = n_batches.get(key, 0) + 1
        rep.setdefault(key, bm)
        covered += bm["real_size"]
    dropped = args.sentences - covered

    remat = args.remat if args.remat == "auto" else \
        args.remat.lower() in ("1", "true", "yes")
    cfg = ModelConfig(size=D, input_size=E, compute_dtype="bfloat16",
                      use_obj=args.cliora,
                      remat=remat, remat_frac=args.remat_frac)
    tc = TrainConfig(lr=5e-4, k_neg=KNEG, emb_trainable=True,
                     vg_loss=args.cliora, use_contr=args.cliora,
                     attn_impl="pallas" if args.cliora else "einsum")
    trainer = Trainer.build(cfg, tc, V, seed=0)

    from cliora_tpu.ops.chart_pass import remat_enabled

    K = args.steps_per_call
    per_bucket = {}
    for key in sorted(rep):
        Lp, B = key
        bm = rep[key]
        dev = {
            "sentences": jnp.asarray(bm["sentences"]),
            "neg_samples": jnp.asarray(bm["neg_samples"]),
            "lengths": jnp.asarray(bm["lengths"], jnp.int32),
        }
        if args.cliora:
            dev["obj_feats"] = jnp.asarray(
                rs.randn(B, R, F).astype(np.float32))
        group = [dev] * K

        t0 = time.time()
        ms = trainer.steps(group)                      # compile + warm
        float(ms[-1]["total_loss"])                    # tunnel-safe sync
        compile_s = time.time() - t0

        t0 = time.time()
        for _ in range(args.timed_calls):
            ms = trainer.steps(group)
        float(ms[-1]["total_loss"])
        dt = (time.time() - t0) / (args.timed_calls * K)
        per_bucket[f"{Lp}:{B}"] = {
            "ms_per_step": round(dt * 1e3, 2),
            "sents_per_sec": round(B / dt, 1),
            "n_batches": n_batches[key],
            "remat": bool(remat_enabled(cfg, B, Lp, D)),
            "compile_s": round(compile_s, 1),
        }
        print(f"bucket L<={Lp} B={B}: {dt * 1e3:7.2f} ms/step  "
              f"{B / dt:7.0f} sents/s  x{n_batches[key]} batches  "
              f"remat={per_bucket[f'{Lp}:{B}']['remat']}", flush=True)

    # throughput counts REAL sentences only: padded/repeated rows do
    # work but carry no training signal
    epoch_s = sum(n_batches[(L, B)]
                  * per_bucket[f"{L}:{B}"]["ms_per_step"] / 1e3
                  for (L, B) in n_batches)
    print(json.dumps({
        "metric": ("cliora" if args.cliora else "diora")
        + "_bucketed_mixed_length_train_sents_per_sec_per_chip",
        "value": round(covered / epoch_s, 1),
        "unit": "sentences/sec/chip",
        "buckets": buckets,
        "batch": args.batch,
        "mixed": args.mixed,
        "covered_sentences": covered,
        "dropped_sentences": dropped,
        "remat": args.remat,
        "remat_frac": args.remat_frac,
        "steps_per_call": K,
        "per_bucket": per_bucket,
    }))


if __name__ == "__main__":
    main()
