"""Host-side CKY backpointer decode throughput: C vs python.

The device emits (B, ncells) backpointers; the host turns them into
trees/spans (analysis/trees.py decode_batch).  This measures that hot
loop both ways -- the python path capped the end-to-end parse pipeline
below the chip's 27.9k sentences/s (BASELINE.md), which motivated the C
decoder (cliora_tpu/native/_fasttrees.c).

Usage::

    python tools/bench_decode.py [--batch 128] [--length 20] [--reps 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--length", default=20, type=int)
    ap.add_argument("--reps", default=50, type=int)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-only measurement

    from cliora_tpu import native
    from cliora_tpu.analysis.trees import decode_batch
    from cliora_tpu.chart.offsets import random_backpointers

    n, B = args.length, args.batch
    bp = random_backpointers(np.random.RandomState(0), n, B)

    def timed():
        t0 = time.time()
        for _ in range(args.reps):
            decode_batch(bp, n)
        return (time.time() - t0) / args.reps

    results = {}
    if native.load() is not None:
        results["native_C"] = timed()
    native._CACHE = None  # force the python fallback
    os.environ["CLIORA_TPU_NO_NATIVE"] = "1"
    results["python"] = timed()

    for name, dt in results.items():
        print(f"{name:>9}: {dt * 1e3:7.2f} ms/batch  "
              f"{B / dt:9.0f} sentences/s")
    if "native_C" in results:
        print(f"  speedup: {results['python'] / results['native_C']:.1f}x")


if __name__ == "__main__":
    main()
