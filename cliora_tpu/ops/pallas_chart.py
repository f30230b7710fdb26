"""Fully-fused inside pass + CKY as a single Pallas TPU kernel.

One kernel invocation runs the whole bottom-up recursion for a block of
``BB`` sentences with the charts resident in VMEM: zero HBM traffic
between levels and a single dispatch, vs. ~n gather/compose/scatter
rounds through HBM for the XLA paths.  (reference equivalent: the inside
half of cliora/net/diora.py:295-335 + the host-side CKY of
cliora/analysis/cky.py:31-99, here fused on device.)

Structure (v2 -- compiles at production sizes):

  * ONE ``fori_loop`` over levels and one over splits, so Mosaic
    allocates the per-iteration temporaries once (VMEM stack is
    max-over-iterations).  v1 unrolled both loops in Python and the
    stack summed across iterations (~27 MB at n=20, D=400 -- rejected
    by Mosaic; see tests/test_pallas_chart.py history).
  * All tiles are FIXED size ``Mmax = (n-1)*BB`` rows.  Rows beyond the
    level's true ``M = (n-level)*BB`` compute garbage, but garbage cells
    are only ever read by other garbage cells (a span [p, p+l+1) with
    p < n-l only gathers children with in-range positions), so no
    masking is needed -- the same invariant the padded-length XLA path
    uses (ops/chart_pass.py).
  * h chart: ``(n, n*BB, D)``, column ``pos*BB + b``.  Left child of
    split k is the row-k prefix; the right child needs rows shifted by
    ``r0 = (k+1)*BB``, done with a dynamic ``pltpu.roll`` of the full
    row (cheap VPU shuffle) -- no transposes, no reverses.
  * splits accumulate ONLINE (flash-attention style): running max,
    exp-sum, weighted h/s sums, and raw CKY best/argmax live in scratch
    refs; the final normalize divides once per level.  CKY values are
    re-based by the split max at the end (the reference max-normalizes
    per cell, cliora/analysis/utils.py:78-95) -- the argmax itself is
    shift-invariant.
  * score/CKY-value/backpointer charts share ONE ``(n, n*BB, 128)``
    f32 buffer (lanes 0/1/2) -- a (x, 1) column pads to 128 lanes
    anyway, so packing three charts into one buffer saves 2/3 of that
    VMEM.

Inference-only (no VJP is defined -- differentiating through it raises);
training keeps the XLA implementation.

MEASURED (TPU v5e, 2026-08-16, B=128, n=20, D=400, bp-only sync):
compiles + validates at production sizes (99.96% backpointer agreement
with the XLA path, cky_val max|diff| 6e-6); 8.1 ms vs the XLA fused
inside+CKY's 3.0 ms.  The kernel is latency-bound: ~190 sequential
(level, split) iterations with fixed Mmax=(n-1)*BB row tiles give a
2.7x FLOP redundancy and bf16 matmul inputs do not help (8.4 ms).
XLA's exact-shape level-batched matmuls win for this workload, so the
XLA path stays the parse default; the kernel is opt-in via
``Trainer.parse(..., impl='pallas')`` / ``ModelConfig.parse_impl`` and
is kept as the substrate for future fusion work (its single-dispatch,
zero-HBM structure is what a multi-sentence-per-tile variant needs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cliora_tpu.chart.offsets import ncells

# sentences per program: keeps the h chart + weights + per-iteration
# temporaries inside the ~16 MB VMEM budget at n<=20, D<=400, and keeps
# all row offsets sublane-aligned for f32 (8, 128) tiles
BB = 8


def _vmem_bytes(n: int, D: int) -> int:
    Dp = -(-D // 128) * 128                  # lane padding
    cols = n * BB
    Mmax = (n - 1) * BB
    vmem = n * cols * Dp * 4                 # h chart
    vmem += n * cols * 128 * 4               # packed s/cky/bp chart
    vmem += Mmax * Dp * 4 * 2                # h_acc scratch + h_k temp
    vmem += Mmax * 128 * 4 * 6               # column accumulators
    vmem += (2 * D * Dp + D * Dp) * 4        # w0, w1, mat (padded)
    vmem += cols * Dp * 4 * 2                # rolled-row temporaries
    return vmem


def supports(n: int, D: int, batch: int) -> bool:
    """Whether the fused kernel fits VMEM / shape constraints."""
    return (batch % BB == 0 and n >= 3
            and _vmem_bytes(n, D) < 13 * 1024 * 1024)


def _kernel(n, D, norm, cdt,
            h0_ref, w0_ref, b0_ref, w1_ref, b1_ref, mat_ref,
            out_s_ref, out_bp_ref, out_val_ref,
            h_s, sc_s, h_acc, m_run, z_run, s_acc, best, barg):
    """sc_s lanes: 0 = inside_s, 1 = cky value, 2 = backpointer (as f32).

    ``cdt`` is the matmul input dtype: bf16 rides the MXU at 4x the f32
    rate (accumulation stays f32 via preferred_element_type).
    """
    f32 = jnp.float32
    cols = n * BB
    Mmax = (n - 1) * BB

    # leaves -> chart level-0 rows (cols pos*BB + b); per-position copies
    # avoid a major-dim transpose
    for pos in range(n):
        h_s[0, pos * BB:(pos + 1) * BB, :] = h0_ref[:, pos, :]
    # lane 0 = inside_s (0), lane 1 = cky leaf value (1), lane 2 = bp (0);
    # lane-column stores -- .at[].set on a value lowers to an unsupported
    # Mosaic scatter
    sc_s[0, :, :] = jnp.zeros((cols, 128), f32)
    sc_s[0, :, 1:2] = jnp.ones((cols, 1), f32)

    w0 = w0_ref[...].astype(cdt)                  # (D, 2D) torch layout
    b0 = b0_ref[...]
    w1 = w1_ref[...].astype(cdt)
    b1 = b1_ref[...]
    mat = mat_ref[...].astype(cdt)

    def level_body(level, _):
        # reset online-softmax accumulators
        m_run[...] = jnp.full((Mmax, 128), -1e30, f32)
        z_run[...] = jnp.zeros((Mmax, 128), f32)
        s_acc[...] = jnp.zeros((Mmax, 128), f32)
        best[...] = jnp.full((Mmax, 128), -1e30, f32)
        barg[...] = jnp.zeros((Mmax, 128), f32)
        h_acc[...] = jnp.zeros((Mmax, D), f32)

        def split_body(k, _):
            # roll left by r0 == roll right by cols - r0 (keep the traced
            # shift non-negative)
            shift = cols - (k + 1) * BB
            lh = h_s[k, 0:Mmax, :]                            # (Mmax, D)
            rrow = pltpu.roll(h_s[level - k - 1], shift, axis=0)
            rh = rrow[0:Mmax, :]
            lhc = lh.astype(cdt)
            rhc = rh.astype(cdt)

            # compose: split w0 into its [left; right] halves to skip
            # materializing the (Mmax, 2D) concat
            h1 = jnp.maximum(
                jax.lax.dot_general(lhc, w0[:, 0:D], (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
                + jax.lax.dot_general(rhc, w0[:, D:2 * D],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32)
                + b0, 0.0)
            hk = jnp.maximum(
                jax.lax.dot_general(h1.astype(cdt), w1,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
                + b1, 0.0)                                     # (Mmax, D)

            # bilinear lh @ mat (contract mat dim 0 -- reference:
            # torch.matmul(v1, self.mat), cliora/net/diora.py:95)
            bil = jnp.sum(jax.lax.dot_general(
                lhc, mat, (((1,), (0,)), ((), ())),
                preferred_element_type=f32) * rh,
                axis=1, keepdims=True)                         # (Mmax, 1)

            lsc = sc_s[k, 0:Mmax, :]                           # (Mmax, 128)
            rsc = pltpu.roll(sc_s[level - k - 1], shift, axis=0)[0:Mmax, :]
            sck = bil[:, 0:1] + lsc[:, 0:1] + rsc[:, 0:1]      # (Mmax, 1)
            # raw CKY candidate (shift by the split max happens at the end)
            psk = sck + lsc[:, 1:2] + rsc[:, 1:2]

            m_old = m_run[:, 0:1]
            m_new = jnp.maximum(m_old, sck)
            corr = jnp.exp(m_old - m_new)
            e = jnp.exp(sck - m_new)
            m_run[:, 0:1] = m_new
            z_run[:, 0:1] = z_run[:, 0:1] * corr + e
            s_acc[:, 0:1] = s_acc[:, 0:1] * corr + sck * e
            h_acc[...] = h_acc[...] * corr + hk * e

            better = psk > best[:, 0:1]
            best[:, 0:1] = jnp.where(better, psk, best[:, 0:1])
            barg[:, 0:1] = jnp.where(
                better, jnp.full_like(psk, 1.0) * k, barg[:, 0:1])
            return 0

        jax.lax.fori_loop(0, level, split_body, 0)

        z = z_run[:, 0:1]
        h_agg = h_acc[...] / z
        if norm == "unit":
            inv = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(h_agg * h_agg, axis=1, keepdims=True), 1e-16))
            h_agg = h_agg * inv
        h_s[level, 0:Mmax, :] = h_agg

        sc_s[level, 0:Mmax, 0:1] = s_acc[:, 0:1] / z
        # cky value re-based by the split max (reference hook semantics)
        sc_s[level, 0:Mmax, 1:2] = best[:, 0:1] - m_run[:, 0:1]
        sc_s[level, 0:Mmax, 2:3] = barg[:, 0:1]
        return 0

    jax.lax.fori_loop(1, n, level_body, 0)

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
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    kernel = functools.partial(_kernel, n, D, norm, cdt)
    out_s, out_bp, out_val = pl.pallas_call(
        kernel,
        grid=(nprog,),
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
            pltpu.VMEM((n, cols, D), jnp.float32),        # h chart
            pltpu.VMEM((n, cols, 128), jnp.float32),      # s/cky/bp packed
            pltpu.VMEM(((n - 1) * BB, D), jnp.float32),   # h accumulator
            pltpu.VMEM(((n - 1) * BB, 128), jnp.float32),  # running max
            pltpu.VMEM(((n - 1) * BB, 128), jnp.float32),  # exp sum
            pltpu.VMEM(((n - 1) * BB, 128), jnp.float32),  # weighted score
            pltpu.VMEM(((n - 1) * BB, 128), jnp.float32),  # cky best
            pltpu.VMEM(((n - 1) * BB, 128), jnp.float32),  # cky argmax
        ],
    )(h0, cp["fc0"]["w"], cp["fc0"]["b"], cp["fc1"]["w"], cp["fc1"]["b"],
      dp["inside_score"]["mat"])

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
