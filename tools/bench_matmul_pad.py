"""Microbenchmark: are the production matmuls lane-misaligned at D=400?

The step profile (tools/profile_step.py, round 3) shows the matmuls at
~70% MXU efficiency.  D=400 is 3.125 x the 128-lane tile; XLA pads each
tile internally, so explicitly zero-padding D->512 *should* be a wash --
but "should" is not a measurement (VERDICT r3 item 2).  This tool times
the exact production matmul shapes (the compose fc0/fc1 and bilinear
GEMMs at the B=128, L=20 envelope row counts) at D=400 vs the same ops
zero-padded to D=512, reporting ms and *effective* TFLOP/s (real-work
FLOPs / wall), on whatever backend is default (run on the TPU).

Usage: python tools/bench_matmul_pad.py [--rows 170240] [--steps 50]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, steps, sync):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    # total gathered child rows per inside pass at B=128, n=20:
    # B * sum_l l*(n-l) = 128 * 1330 = 170240
    ap.add_argument("--rows", default=170240, type=int)
    ap.add_argument("--steps", default=50, type=int)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    M = args.rows
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)

    def sync(x):
        jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), x)

    print(f"backend={jax.default_backend()} rows={M} dtype={args.dtype}",
          flush=True)

    for D in (400, 512):
        x2 = jax.random.normal(key, (M, 2 * D), dt)
        x1 = jax.random.normal(key, (M, D), dt)
        w0 = jax.random.normal(key, (2 * D, D), dt)
        w1 = jax.random.normal(key, (D, D), dt)
        mat = jax.random.normal(key, (D, D), dt)

        @jax.jit
        def level_matmuls(x2, x1, w0, w1, mat):
            # fc0: (M, 2D) @ (2D, D); fc1 + bilinear: (M, D) @ (D, D)
            h0 = jnp.maximum(x2 @ w0, 0)
            h1 = jnp.maximum(h0 @ w1, 0)
            proj = x1 @ mat
            return h1, proj

        dts = bench(level_matmuls, (x2, x1, w0, w1, mat), args.steps, sync)
        flops = 2 * M * (2 * D * D + D * D + D * D)   # real work at this D
        # effective = per-real-FLOP rate using D=400's work for both
        real = 2 * M * (2 * 400 * 400 + 400 * 400 + 400 * 400)
        print(f"D={D}: {dts * 1e3:7.2f} ms   raw {flops / dts / 1e12:5.1f} "
              f"TFLOP/s   effective(D400-work) {real / dts / 1e12:5.1f} "
              f"TFLOP/s", flush=True)

    # the padded variant a model-level change would produce: real data in
    # the first 400 lanes, zeros beyond (weights zero-padded too)
    D, Dp = 400, 512
    x2 = jnp.zeros((M, 2 * Dp), dt).at[:, :2 * D].set(
        jax.random.normal(key, (M, 2 * D), dt))
    x1 = jnp.zeros((M, Dp), dt).at[:, :D].set(
        jax.random.normal(key, (M, D), dt))
    w0 = jnp.zeros((2 * Dp, Dp), dt).at[:2 * D, :D].set(
        jax.random.normal(key, (2 * D, D), dt))
    w1 = jnp.zeros((Dp, Dp), dt).at[:D, :D].set(
        jax.random.normal(key, (D, D), dt))
    mat = jnp.zeros((Dp, Dp), dt).at[:D, :D].set(
        jax.random.normal(key, (D, D), dt))

    @jax.jit
    def level_matmuls(x2, x1, w0, w1, mat):
        h0 = jnp.maximum(x2 @ w0, 0)
        h1 = jnp.maximum(h0 @ w1, 0)
        proj = x1 @ mat
        return h1, proj

    dts = bench(level_matmuls, (x2, x1, w0, w1, mat), args.steps, sync)
    real = 2 * M * (2 * 400 * 400 + 400 * 400 + 400 * 400)
    print(f"D=400 zero-padded to 512: {dts * 1e3:7.2f} ms   "
          f"effective {real / dts / 1e12:5.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
