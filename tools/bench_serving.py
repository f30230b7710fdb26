"""Serving-path throughput: sealed bundle vs live Trainer.parse.

Exports a DIORA-sized text bundle (D=400, one padded-length bucket),
then measures end-to-end request latency/throughput through
``ExportedParser.parse`` (pad -> artifact call -> host CKY decode)
against the live jitted parse on the same batch.

Usage::

    python tools/bench_serving.py [--batch 128] [--length 20] [--steps 20]

On the TPU this quantifies the deployment story next to BASELINE.md's
raw parse number (the fused Pallas decode, 27.9k sents/s at B=512).
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _bench_concurrent(served, sents, args):
    """N threads x M single-sentence requests: micro-batched dispatch
    (serving.MicroBatcher) vs a lock-serialized call per request (the
    pre-batching server behavior)."""
    import threading
    import time

    from cliora_tpu.serving import MicroBatcher

    N, M = args.concurrency, max(1, args.requests // args.concurrency)
    reqs = [[sents[i % len(sents)]] for i in range(N)]

    def run(fn):
        barrier = threading.Barrier(N)

        def stream(i):
            barrier.wait()
            for _ in range(M):
                fn(reqs[i])

        threads = [threading.Thread(target=stream, args=(i,))
                   for i in range(N)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.time() - t0

    if args.no_warm:
        print("warmup : skipped (--no_warm); first hit per novel "
              "coalesced shape pays its compile", flush=True)
    else:
        t0 = time.time()
        n = served.warmup(N)  # pre-specialize the quantized batch shapes
        print(f"warmup : {n} shapes in {time.time() - t0:.1f}s",
              flush=True)

    lock = threading.Lock()

    def serialized(sentences):
        with lock:
            return served.parse(sentences)

    t0 = time.time()
    serialized(reqs[0])
    print(f"first single-sentence response: {time.time() - t0:.2f}s "
          f"(compile or bundle-cache load for shape B=1)", flush=True)

    mb = MicroBatcher(served, max_batch=N, max_wait_ms=5.0)
    t0 = time.time()
    mb.submit(reqs[0])  # warm
    print(f"first microbatch response: {time.time() - t0:.2f}s",
          flush=True)
    total = N * M
    for name, fn in (("serialized", serialized), ("microbatch", mb.submit)):
        dt = run(fn)
        print(f"{name:>10}: {total / dt:8.1f} req/s at concurrency "
              f"{N} ({dt / total * 1e3:.2f} ms/req)", flush=True)
    mb.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--length", default=20, type=int)
    ap.add_argument("--hidden", default=400, type=int)
    ap.add_argument("--steps", default=20, type=int)
    ap.add_argument("--concurrency", default=1, type=int,
                    help="also bench N concurrent single-sentence "
                         "request streams through serving.MicroBatcher "
                         "vs lock-serialized per-request dispatch")
    ap.add_argument("--requests", default=200, type=int,
                    help="requests per concurrent stream benchmark")
    ap.add_argument("--no_warm", action="store_true",
                    help="skip warmup before the concurrent benchmark "
                         "(reproduces the un-warmed micro-batching "
                         "baseline in BASELINE.md)")
    ap.add_argument("--bundle_dir", default=None,
                    help="persist the bundle (and its xla_cache of "
                         "specialized executables) here and reuse it if "
                         "present; run twice to measure the warm-RESTART "
                         "path -- the second process's warmup should "
                         "load executables from the bundle cache in "
                         "seconds instead of recompiling (serving.py "
                         "ExportedParser cache)")
    ap.add_argument("--baked_params", action="store_true",
                    help="export with weights baked into the artifact "
                         "as constants (the classic sealed form) "
                         "instead of the weights-as-arguments default; "
                         "reused bundles follow their manifest, not "
                         "this flag")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. 'cpu' for a host-"
                         "side smoke); default probes the TPU tunnel "
                         "first so a down tunnel cannot hang the tool")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        from cliora_tpu.utils.tpu_probe import tpu_reachable

        if not tpu_reachable():
            print("TPU tunnel unreachable; pass --platform cpu for a "
                  "host-side run")
            return

    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.models.params import init_params
    from cliora_tpu.serving import (
        ExportedParser,
        export_parser,
        save_bundle,
    )
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    B, L = args.batch, args.length
    cfg = ModelConfig(size=args.hidden, input_size=1024)
    params = init_params(jax.random.PRNGKey(0), cfg, 10000)
    rs = np.random.RandomState(0)
    sents = [list(rs.randint(2, 10000, L)) for _ in range(B)]

    import contextlib

    if args.bundle_dir:
        ctx = contextlib.nullcontext(args.bundle_dir)
        reuse = os.path.exists(os.path.join(args.bundle_dir,
                                            "manifest.json"))
    else:
        ctx = tempfile.TemporaryDirectory()
        reuse = False
    in_args = not args.baked_params
    if not reuse:
        t0 = time.time()
        arts = export_parser(cfg, params, [L], params_in_args=in_args)
        print(f"export: {time.time() - t0:.1f}s, "
              f"{len(arts[L]) / 1e6:.2f} MB "
              f"({'weights-as-args' if in_args else 'baked'})",
              flush=True)
    with ctx as d:
        if not reuse:
            save_bundle(d, cfg, arts, params=params if in_args else None)
        else:
            print(f"reusing bundle at {d} (warm-restart path)",
                  flush=True)
        # persistent bundles cache their specialized executables
        served = ExportedParser(d, cache=bool(args.bundle_dir))

        t0 = time.time()
        served.parse(sents)           # warm (compile or cache load)
        print(f"first-hit specialize (B={B}): {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        for _ in range(args.steps):
            served.parse(sents)
        dt = (time.time() - t0) / args.steps
        print(f"bundle : {dt * 1e3:7.1f} ms/batch  "
              f"{B / dt:8.0f} sents/s", flush=True)

        if args.concurrency > 1:
            _bench_concurrent(served, sents, args)

    trainer = Trainer(cfg, TrainConfig(k_neg=5), params)
    batch = {"sentences": np.asarray(sents, np.int32)}
    trainer.parse(batch)                         # warm (compile)
    t0 = time.time()
    for _ in range(args.steps):
        trainer.parse(batch)
    dt = (time.time() - t0) / args.steps
    print(f"live   : {dt * 1e3:7.1f} ms/batch  "
          f"{B / dt:8.0f} sents/s (parse_impl={cfg.parse_impl})",
          flush=True)


if __name__ == "__main__":
    main()
