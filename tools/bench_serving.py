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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--length", default=20, type=int)
    ap.add_argument("--hidden", default=400, type=int)
    ap.add_argument("--steps", default=20, type=int)
    args = ap.parse_args()

    import jax

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

    t0 = time.time()
    arts = export_parser(cfg, params, [L])
    print(f"export: {time.time() - t0:.1f}s, "
          f"{len(arts[L]) / 1e6:.2f} MB", flush=True)
    with tempfile.TemporaryDirectory() as d:
        save_bundle(d, cfg, arts)
        served = ExportedParser(d)

        served.parse(sents)                      # warm (compile)
        t0 = time.time()
        for _ in range(args.steps):
            served.parse(sents)
        dt = (time.time() - t0) / args.steps
        print(f"bundle : {dt * 1e3:7.1f} ms/batch  "
              f"{B / dt:8.0f} sents/s", flush=True)

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
