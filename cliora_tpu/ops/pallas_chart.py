"""Fully-fused inside pass + CKY as a single Pallas TPU kernel.

One kernel invocation runs the whole bottom-up recursion for a block of
``BB`` sentences with the charts resident in VMEM: zero HBM traffic
between levels and a single dispatch, vs. ~n gather/compose/scatter
rounds through HBM for the XLA paths.  (reference equivalent: the inside
half of cliora/net/diora.py:295-335 + the host-side CKY of
cliora/analysis/cky.py:31-99, here fused on device.)

Structure (v3 -- exact shapes, one matmul round per level):

  * Levels are PYTHON-UNROLLED with exact static shapes (a VMEM-stack
    probe confirmed Mosaic reuses matmul temporaries across unrolled
    sections; v1's failure was scoped per-iteration allocations).  v2
    used one ``fori_loop`` with fixed ``Mmax`` tiles -- 2.7x FLOP
    redundancy and ~190 sequential (level, split) matmul rounds; it
    measured 8.1 ms vs XLA's 3.0 ms at B=128, n=20, D=400.
  * Per level, ALL splits are stacked into one ``(level*M, D)`` tile
    (``M = (n-level)*BB`` rows per split, copied with static
    sublane-aligned slices -- Mosaic has no bf16 rotate, and unrolled
    static shifts need none), so each level runs ONE compose/score
    matmul round at exact shape: total matmul FLOPs match the math
    exactly and the sequential matmul rounds drop from ~190 to ~3 per
    level.
  * Split softmax / CKY best-split then combine the stack with an
    unrolled elementwise pass over the ``level`` split views.
  * h chart + stacked tiles live in the compute dtype (bf16 halves VMEM
    and feeds the MXU directly); scores/softmax/CKY stay f32 in a packed
    ``(n, cols, 128)`` buffer (lanes 0/1/2 = inside_s / cky value / bp).

Inference-only (no VJP is defined -- differentiating through it raises);
training keeps the XLA implementation.

MEASURED (TPU v5e, B=128, n=20, D=400, bp-only sync, 2026-08-17):

  * wall (20-step loop, min of 4 runs): kernel 3.83-4.14 ms vs the XLA
    fused inside+CKY's 4.09-4.27 ms -- a tie-to-slight-win (tunnel
    jitter +-0.3 ms); v2 was 8.1 ms on the same harness family.
  * device-busy (profiler trace): kernel 2.09 ms vs XLA 1.80 ms -- XLA
    keeps a ~15% raw-compute edge (its level matmuls batch all 128
    sentences; the kernel tiles 16/program).
  * host/dispatch: ONE launch vs ~140 ops -- traced single-stream wall
    7.6 ms vs 26.2 ms; the kernel wins wherever per-op dispatch is the
    bottleneck (low-queue-depth serving, tunneled/remote hosts).
  * bp agreement with the XLA path: 99.5% (bf16 split-score ties break
    differently; cky_val max|diff| ~1e-5 in f32).

The kernel is therefore the default for the decode-only text parse
(``ModelConfig.parse_impl='pallas'`` routes via ``supports()``, falling
back to XLA); training and chart-producing evals keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cliora_tpu.chart.offsets import ncells

# sentences per program: larger BB = fatter matmul tiles (BB=8 -> 16
# cut the measured wall 5.3 -> 3.8-4.1 ms at n=20, D=400) at the cost
# of VMEM; BB=32's fully-unrolled compile exceeded 10 min (rejected).
# Keeps all row offsets sublane-aligned for (8, 128) tiles.
BB = 16

# rows per compose/score matmul chunk: caps the (rows, D) f32 matmul
# temporaries on the Mosaic VMEM stack; multiples of M are used so
# split rows stay contiguous (896 vs 448: same device time, slightly
# better wall; 1792 identical -- the gap vs XLA is not matmul shape)
_ROWCAP = 896


def _smax(n: int) -> int:
    """Largest stacked-splits tile: max_level level*(n-level)*BB rows."""
    return max(lvl * (n - lvl) for lvl in range(1, n)) * BB


def _vmem_bytes(n: int, D: int, itemsize: int = 2) -> int:
    """Scoped-VMEM estimate (scratch + stack).

    The buffer arithmetic below underestimates Mosaic's actual scoped
    allocation by ~1.5x (measured: formula 12.9 MB vs reported 18.85 MB
    at n=20, D=400, BB=8 bf16 -- the stack allocator is non-additive;
    removing work can even *grow* it), so ``supports`` applies that
    calibration factor against the raised ``vmem_limit_bytes`` cap.
    """
    Dp = -(-D // 128) * 128                  # lane padding
    cols = n * BB
    S = _smax(n)
    vmem = n * cols * Dp * itemsize          # h chart (compute dtype)
    vmem += n * cols * 128 * 4               # packed s/cky/bp chart
    vmem += 2 * S * Dp * itemsize            # lh/rh stacked tiles (lh
    #                                          doubles as the hk output)
    vmem += S * 128 * 4                      # packed l/r score tile
    vmem += (2 * D * Dp + 2 * D * Dp) * itemsize   # w0, w1, mat
    # matmul temporaries are row-capped by the chunked compose loop
    rows = min(S, _ROWCAP + (n - 1) * BB)
    vmem += 3 * rows * Dp * 4                # matmul/combine temporaries
    vmem += 2 * (n - 1) * BB * Dp * 4        # level-combine accumulators
    return vmem


# raised Mosaic scoped-vmem cap (default 16 MB): the v5e accepts and
# runs kernels well above the default; measured headroom covers the
# n=20, D=400, BB=16 production shape
_VMEM_CAP = 48 * 1024 * 1024


def supports(n: int, D: int, batch: int,
             compute_dtype: str = "float32") -> bool:
    """Whether the fused kernel fits VMEM / shape constraints."""
    itemsize = 2 if compute_dtype == "bfloat16" else 4
    est = int(_vmem_bytes(n, D, itemsize) * 1.5)   # calibration, see above
    return (batch % BB == 0 and n >= 3
            and est < _VMEM_CAP - 4 * 1024 * 1024)


def _kernel(n, D, norm, cdt,
            h0_ref, w0_ref, b0_ref, w1_ref, b1_ref, mat_ref,
            out_s_ref, out_bp_ref, out_val_ref,
            h_s, sc_s, lh_s, rh_s, lrsc_s):
    """sc_s lanes: 0 = inside_s, 1 = cky value, 2 = backpointer (as f32).
    lrsc_s lanes: 0/1 = left child s/val, 2/3 = right child s/val.

    ``cdt`` is the matmul/chart dtype: bf16 rides the MXU at full rate
    (accumulation stays f32 via preferred_element_type).  ``lh_s`` is
    reused as the composed-``hk`` output tile once the bilinear score no
    longer needs the left child (saves one (S, D) VMEM buffer).
    """
    f32 = jnp.float32
    cols = n * BB

    # leaves -> chart level-0 rows (cols pos*BB + b); per-position copies
    # avoid a major-dim transpose
    for pos in range(n):
        h_s[0, pos * BB:(pos + 1) * BB, :] = h0_ref[:, pos, :]
    # lane 0 = inside_s (0), lane 1 = cky leaf value (1), lane 2 = bp (0)
    sc_s[0, :, :] = jnp.zeros((cols, 128), f32)
    sc_s[0, :, 1:2] = jnp.ones((cols, 1), f32)

    # weights and h0 arrive pre-cast to ``cdt`` (in-kernel casts would
    # put extra f32->bf16 copies on the VMEM stack)
    w0 = w0_ref[...]                              # (D, 2D) torch layout
    b0 = b0_ref[...]
    w1 = w1_ref[...]
    b1 = b1_ref[...]
    mat = mat_ref[...]

    for level in range(1, n):
        M = (n - level) * BB                      # rows per split
        S = level * M                             # stacked rows

        # 1. stack all splits: static sublane-aligned slice copies (the
        # right child of split k starts (k+1)*BB rows in; Mosaic has no
        # bf16 rotate, and none is needed with static shifts)
        for k in range(level):
            r0 = (k + 1) * BB
            lh_s[k * M:(k + 1) * M, :] = h_s[k, 0:M, :]
            rh_s[k * M:(k + 1) * M, :] = h_s[level - k - 1, r0:r0 + M, :]
            lrsc_s[k * M:(k + 1) * M, 0:2] = sc_s[k, 0:M, 0:2]
            lrsc_s[k * M:(k + 1) * M, 2:4] = (
                sc_s[level - k - 1, r0:r0 + M, 0:2])

        # 2. compose/score matmul rounds in split chunks of <= _ROWCAP
        # rows: exact total FLOPs, but the (rows, D) f32 matmul
        # temporaries stay small enough for the ~16 MB VMEM stack (the
        # whole-S variant OOMed the Mosaic stack at 19.7 MB, n=20 D=400)
        csplits = max(1, _ROWCAP // M)
        for c0 in range(0, level, csplits):
            c1 = min(level, c0 + csplits)
            q0, q1 = c0 * M, c1 * M
            lh = lh_s[q0:q1, :]
            rh = rh_s[q0:q1, :]
            h1 = jnp.maximum(
                jax.lax.dot_general(lh, w0[:, 0:D],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
                + jax.lax.dot_general(rh, w0[:, D:2 * D],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32)
                + b0, 0.0)

            # bilinear lh @ mat (contract mat dim 0 -- reference:
            # torch.matmul(v1, self.mat), cliora/net/diora.py:95)
            bil = jnp.sum(jax.lax.dot_general(
                lh, mat, (((1,), (0,)), ((), ())),
                preferred_element_type=f32) * rh.astype(f32),
                axis=1, keepdims=True)            # (rows, 1)
            # lh no longer needed: reuse its tile for the composed output
            lh_s[q0:q1, :] = jnp.maximum(
                jax.lax.dot_general(h1.astype(cdt), w1,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
                + b1, 0.0).astype(cdt)

            # lanes 4/5: sck (split score) / psk (raw CKY candidate)
            sck = bil + lrsc_s[q0:q1, 0:1] + lrsc_s[q0:q1, 2:3]
            lrsc_s[q0:q1, 4:5] = sck
            lrsc_s[q0:q1, 5:6] = (sck + lrsc_s[q0:q1, 1:2]
                                  + lrsc_s[q0:q1, 3:4])

        # 3. combine the level's splits (unrolled elementwise pass)
        m = lrsc_s[0:M, 4:5]
        for k in range(1, level):
            m = jnp.maximum(m, lrsc_s[k * M:(k + 1) * M, 4:5])
        z = jnp.zeros((M, 1), f32)
        s_acc = jnp.zeros((M, 1), f32)
        h_acc = jnp.zeros((M, D), f32)
        best = lrsc_s[0:M, 5:6]
        barg = jnp.zeros((M, 1), f32)
        for k in range(level):
            sk = lrsc_s[k * M:(k + 1) * M, 4:5]
            e = jnp.exp(sk - m)
            z = z + e
            s_acc = s_acc + sk * e
            h_acc = h_acc + lh_s[k * M:(k + 1) * M, :].astype(f32) * e
            if k > 0:
                pk = lrsc_s[k * M:(k + 1) * M, 5:6]
                better = pk > best
                best = jnp.where(better, pk, best)
                barg = jnp.where(better, jnp.full_like(pk, 1.0) * k, barg)

        h_agg = h_acc / z
        if norm == "unit":
            inv = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(h_agg * h_agg, axis=1, keepdims=True), 1e-16))
            h_agg = h_agg * inv
        h_s[level, 0:M, :] = h_agg.astype(cdt)

        sc_s[level, 0:M, 0:1] = s_acc / z
        # cky value re-based by the split max (the reference hook
        # max-normalizes per cell, cliora/analysis/utils.py:78-95; the
        # argmax is shift-invariant)
        sc_s[level, 0:M, 1:2] = best - m
        sc_s[level, 0:M, 2:3] = barg

    # emit outputs as (cols, n) columns -- static lane index per level,
    # sublane-aligned copies, no transposes
    for level in range(n):
        out_s_ref[0, :, level:level + 1] = sc_s[level, :, 0:1]
        out_val_ref[0, :, level:level + 1] = sc_s[level, :, 1:2]
        out_bp_ref[0, :, level:level + 1] = (
            sc_s[level, :, 2:3].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("norm", "compute_dtype"))
def fused_inside_cky_pallas(dp, h0, norm: str = "unit",
                            compute_dtype: str = "float32"):
    """Inside pass + CKY for (B, n, D) leaves; B % BB == 0.

    Returns flat (B, ncells, 1) inside_s, (B, ncells) int32 cky_bp and
    (B, ncells) cky_val -- matching ops/chart_pass.inside_pass outputs
    (the h chart stays on-chip).  ``compute_dtype='bfloat16'`` runs the
    matmuls at the MXU's native bf16 rate (f32 accumulation).
    """
    B, n, D = h0.shape
    assert B % BB == 0, (B, BB)
    nprog = B // BB
    cp = dp["inside_compose"]
    cols = n * BB
    S = _smax(n)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    kernel = functools.partial(_kernel, n, D, norm, cdt)
    out_s, out_bp, out_val = pl.pallas_call(
        kernel,
        grid=(nprog,),
        # Mosaic's default scoped-vmem limit (16 MB) is conservative:
        # the v5e accepts (and runs) a higher cap, which the unrolled
        # exact-shape kernel needs at n=20, D=400 (scoped ~19 MB at
        # BB=8 -- measured; the allocator is non-additive, removing
        # work can grow it).  Interpret mode ignores compiler_params.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=jax.default_backend() not in ("tpu", "axon"),
        in_specs=[
            pl.BlockSpec((BB, n, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0 (D, 2D)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0 (D,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1 (D, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1 (D,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mat (D, D)
        ],
        out_specs=[
            pl.BlockSpec((1, cols, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nprog, cols, n), jnp.float32),
            jax.ShapeDtypeStruct((nprog, cols, n), jnp.int32),
            jax.ShapeDtypeStruct((nprog, cols, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, cols, D), cdt),            # h chart
            pltpu.VMEM((n, cols, 128), jnp.float32),  # s/cky/bp packed
            pltpu.VMEM((S, D), cdt),                  # lh / hk stacked tile
            pltpu.VMEM((S, D), cdt),                  # rh stacked tile
            pltpu.VMEM((S, 128), jnp.float32),        # l/r score tile
        ],
    )(h0.astype(cdt), cp["fc0"]["w"].astype(cdt), cp["fc0"]["b"],
      cp["fc1"]["w"].astype(cdt), cp["fc1"]["b"],
      dp["inside_score"]["mat"].astype(cdt))

    # (nprog, n*BB, n) column layout (col pos*BB + b) -> flat (B, ncells)
    def to_flat(x):
        x = x.reshape(nprog, n, BB, n)
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, n, n)
        rows = [x[:, level, : n - level] for level in range(n)]
        return jnp.concatenate(rows, axis=1)

    inside_s = to_flat(out_s)[..., None]
    bp = to_flat(out_bp)
    val = to_flat(out_val)
    assert bp.shape == (B, ncells(n))
    return inside_s, bp, val
