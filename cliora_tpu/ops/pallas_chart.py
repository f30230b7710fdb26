"""Fully-fused inside pass + CKY as a single Pallas TPU kernel.

One kernel invocation runs the whole bottom-up recursion for a block of
``BB`` sentences with the charts resident in VMEM: zero HBM traffic
between levels and a single dispatch, vs. ~19 gather/compose/scatter
rounds through HBM for the XLA paths.

Layouts inside the kernel (chosen so nothing ever needs a Mosaic
transpose, reverse, or sublane-axis reduction):

  * h chart: ``(n, n*BB, D)`` with column ``pos*BB + b``.  For split k
    of level l, BOTH children are single-row contiguous slices:
    left = h[k, 0 : L*BB], right = h[level-k-1, (k+1)*BB : (k+1)*BB+L*BB]
    -- staged per split into one ``(N*L*BB, 2D)`` buffer for a single
    MXU matmul chain per level.
  * score / CKY charts: TRANSPOSED ``(n*BB, n)`` column layout, so
    per-split scores line up with the matmul rows as ``(M, 1)`` columns:
    the split softmax, weighted aggregate, and CKY argmax are short
    unrolled loops over splits of pure ``(M, 1)`` column ops, and the
    only reductions are lane reductions (bilinear dot, unit-norm).

Outputs are the split scores, CKY backpointers and values -- exactly
what tree decoding needs (the parse path never reads the h chart);
keeping h internal leaves the working set in VMEM for n <= ~22 at BB=8.

Inference-only (no VJP is defined -- differentiating through it raises);
training keeps the XLA implementation.  (reference equivalent: the
inside half of cliora/net/diora.py:295-335 + the host-side CKY of
cliora/analysis/cky.py:31-99, here fused on device.)

STATUS: experimental.  Numerically verified against the XLA path (tests/
test_pallas_chart.py, interpret mode).  On real v5e hardware the Mosaic
compiler currently rejects it at production sizes (n=20, D=400): stack
slots for the per-level value temporaries are not reused across the
unrolled level loop, so scoped VMEM wants sum-over-levels (~27 MB)
instead of max-over-levels (~5 MB).  A fori_loop + masked fixed-size
level body would fix this at ~1.4x redundant compute; not worth it yet --
the XLA inside+CKY forward already runs at 3.6 ms for B=64/n=20/D=400,
and eval is not the bottleneck.  Kept as the starting point for future
kernel work; use supports() before calling on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cliora_tpu.chart.offsets import ncells

# sentences per program: sized so (2 h-charts + staging + compose
# temporaries) fit the 16 MB VMEM scoped limit at n=20, D=400; also keeps
# slice offsets sublane-aligned
BB = 8


def _max_nm(n: int) -> int:
    """max over levels of N * L * BB rows in the staging buffers."""
    return max(level * (n - level) for level in range(1, n)) * BB


def supports(n: int, D: int, batch: int) -> bool:
    """Whether the fused kernel fits VMEM / shape constraints."""
    Dp = -(-D // 128) * 128                      # lane padding
    vmem = n * n * BB * Dp * 4                   # h chart
    vmem += 4 * _max_nm(n) * Dp * 4              # staging + compose tmps
    return batch % BB == 0 and vmem < 12 * 1024 * 1024


def _kernel(n, D, norm,
            h0_ref, w0_ref, b0_ref, w1_ref, b1_ref, mat_ref,
            out_s_ref, out_bp_ref, out_val_ref,
            h_s, s_s, cv_s, x_buf, sc_buf):
    f32 = jnp.float32
    cols = n * BB

    # leaves -> chart level-0 rows (cols pos*BB + b); per-position copies
    # avoid a major-dim transpose
    for pos in range(n):
        h_s[0, pos * BB:(pos + 1) * BB, :] = h0_ref[:, pos, :]
    zcol = jnp.zeros((cols, 1), f32)
    ocol = jnp.ones((cols, 1), f32)
    s_s[:, 0:1] = zcol
    cv_s[:, 0:1] = ocol
    out_bp_ref[0, :, 0:1] = zcol.astype(jnp.int32)
    out_val_ref[0, :, 0:1] = ocol
    out_s_ref[0, :, 0:1] = zcol

    w0 = w0_ref[...]
    b0 = b0_ref[...]
    w1 = w1_ref[...]
    b1 = b1_ref[...]
    mat = mat_ref[...]

    for level in range(1, n):
        L, N = n - level, level
        M = L * BB
        # stage split-k children contiguously, directly into the two
        # halves of the compose input (static VMEM->VMEM copies): row
        # block k <- [left (k, p) ; right (level-k-1, p+k+1)]
        for k in range(N):
            r0 = (k + 1) * BB
            x_buf[k * M:(k + 1) * M, 0:D] = h_s[k, 0:M, :]
            x_buf[k * M:(k + 1) * M, D:2 * D] = h_s[level - k - 1,
                                                    r0:r0 + M, :]
        lh = x_buf[0:N * M, 0:D]
        rh = x_buf[0:N * M, D:2 * D]

        h = jnp.maximum(jax.lax.dot_general(
            x_buf[0:N * M, :], w0, (((1,), (1,)), ((), ())),
            preferred_element_type=f32) + b0, 0.0)
        h = jnp.maximum(jax.lax.dot_general(
            h, w1, (((1,), (1,)), ((), ())),
            preferred_element_type=f32) + b1, 0.0)          # (N*M, D)

        # bilinear lh @ mat (contract mat dim 0 -- reference:
        # torch.matmul(v1, self.mat), cliora/net/diora.py:95)
        bil = jnp.sum(jax.lax.dot_general(
            lh, mat, (((1,), (0,)), ((), ())),
            preferred_element_type=f32) * rh,
            axis=1, keepdims=True)                          # (N*M, 1)

        # per-split score columns: sc_k = bil_k + ls_k + rs_k
        for k in range(N):
            r0 = (k + 1) * BB
            sc_buf[k * M:(k + 1) * M, 0:1] = (
                bil[k * M:(k + 1) * M]
                + s_s[0:M, k:k + 1]
                + s_s[r0:r0 + M, level - k - 1:level - k])
        sc = sc_buf[0:N * M, 0:1]

        # split softmax + weighted aggregate, unrolled over splits as
        # (M, 1) column ops
        smax = sc[0:M]
        for k in range(1, N):
            smax = jnp.maximum(smax, sc[k * M:(k + 1) * M])
        z = jnp.zeros((M, 1), f32)
        for k in range(N):
            z = z + jnp.exp(sc[k * M:(k + 1) * M] - smax)
        h_agg = jnp.zeros((M, D), f32)
        s_agg = jnp.zeros((M, 1), f32)
        cky_best = jnp.full((M, 1), -1e30, f32)
        cky_arg = jnp.zeros((M, 1), jnp.int32)
        for k in range(N):
            sc_k = sc[k * M:(k + 1) * M]
            p_k = jnp.exp(sc_k - smax) / z
            h_agg = h_agg + h[k * M:(k + 1) * M, :] * p_k
            s_agg = s_agg + sc_k * p_k
            # fused CKY: max-normalized split score + child values
            r0 = (k + 1) * BB
            ps_k = (sc_k - smax
                    + cv_s[0:M, k:k + 1]
                    + cv_s[r0:r0 + M, level - k - 1:level - k])
            better = ps_k > cky_best
            cky_best = jnp.where(better, ps_k, cky_best)
            cky_arg = jnp.where(better, k, cky_arg)

        if norm == "unit":
            inv = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(h_agg * h_agg, axis=1, keepdims=True), 1e-16))
            h_agg = h_agg * inv

        h_s[level, 0:M, :] = h_agg
        s_s[0:M, level:level + 1] = s_agg
        cv_s[0:M, level:level + 1] = cky_best
        out_s_ref[0, 0:M, level:level + 1] = s_agg
        out_val_ref[0, 0:M, level:level + 1] = cky_best
        out_bp_ref[0, 0:M, level:level + 1] = cky_arg


@functools.partial(jax.jit, static_argnames=("norm",))
def fused_inside_cky_pallas(dp, h0, norm: str = "unit"):
    """Inside pass + CKY for (B, n, D) leaves; B % BB == 0.

    Returns flat (B, ncells, 1) inside_s, (B, ncells) int32 cky_bp and
    (B, ncells) cky_val -- matching ops/chart_pass.inside_pass outputs
    (the h chart stays on-chip).
    """
    B, n, D = h0.shape
    assert B % BB == 0, (B, BB)
    nprog = B // BB
    cp = dp["inside_compose"]
    cols = n * BB

    kernel = functools.partial(_kernel, n, D, norm)
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
            pltpu.VMEM((n, cols, D), jnp.float32),   # h chart
            pltpu.VMEM((cols, n), jnp.float32),      # s chart (columns)
            pltpu.VMEM((cols, n), jnp.float32),      # cky value chart
            pltpu.VMEM((_max_nm(n), 2 * D), jnp.float32),  # [lh; rh]
            pltpu.VMEM((_max_nm(n), 1), jnp.float32),      # score columns
        ],
    )(h0, cp["fc0"]["w"], cp["fc0"]["b"], cp["fc1"]["w"], cp["fc1"]["b"],
      dp["inside_score"]["mat"])

    # (nprog, n*BB, n) column layout -> flat (B, ncells)
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
