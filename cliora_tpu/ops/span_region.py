"""Fused span x region best-match scores: ``max_r span . obj``.

The CLIORA losses only consume ``max`` over regions of the span x region
score tensor (reference: cliora/net/trainer.py:103 ``all_atten_score.
max(-1)`` and :145 ``vg_atten_score.max(-1)``), yet the reference -- and
our einsum path -- materialize the full ``(B_text, B_img, cells, R)``
tensor first.  At B=128, L=20 that is 124 MB; at B=512 it is 2 GB, and it
is the batch-size limiter for contrastive training (SURVEY.md section 5).

This module computes ``out[a, c, m] = max_r sum_d span[a, m, d] *
obj[c, r, d]`` in three interchangeable ways:

  * ``einsum``  -- materializing reference semantics (oracle);
  * ``chunked`` -- lax.map over image chunks, O(B * cells * R) live;
  * ``pallas``  -- a TPU kernel: each program computes one
    (row-tile x image) block as a single MXU matmul and reduces the
    region axis in VMEM, so the R axis never exists in HBM.

All carry a custom VJP that avoids the big tensor in the backward too:
only the argmax region index (int32) is saved, and gradients flow
through a per-image scan (max is locally linear in its argmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256


def _max_and_argmax_einsum(span, obj):
    # contract in the span dtype (bf16 when charts are bf16-stored),
    # accumulate scores in f32
    scores = jnp.einsum("amd,crd->acmr", span, obj.astype(span.dtype),
                        preferred_element_type=jnp.float32)
    return jnp.max(scores, -1), jnp.argmax(scores, -1).astype(jnp.int32)


def _max_and_argmax_chunked(span, obj, chunk: int = 8):
    C = obj.shape[0]
    assert C % chunk == 0 or chunk >= C, (C, chunk)
    chunk = min(chunk, C)
    obj = obj.astype(span.dtype)    # cast once, outside the scanned body

    def one_chunk(obj_c):
        s = jnp.einsum("amd,crd->acmr", span, obj_c,
                       preferred_element_type=jnp.float32)
        return jnp.max(s, -1), jnp.argmax(s, -1).astype(jnp.int32)

    obj_chunks = obj.reshape(C // chunk, chunk, *obj.shape[1:])
    mx, am = jax.lax.map(one_chunk, obj_chunks)     # (C/ch, A, ch, M)
    mx = jnp.moveaxis(mx, 0, 1).reshape(span.shape[0], C, span.shape[1])
    am = jnp.moveaxis(am, 0, 1).reshape(span.shape[0], C, span.shape[1])
    return mx, am


C_TILE = 8  # images per program; keeps the out block sublane-aligned


def _pallas_kernel(span_ref, obj_ref, max_ref, arg_ref):
    # (C_TILE, R, tile) = batched matmul over the image sub-block
    scores = jax.lax.dot_general(
        obj_ref[...], span_ref[...],
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    max_ref[...] = jnp.max(scores, axis=1)
    arg_ref[...] = jnp.argmax(scores, axis=1).astype(jnp.int32)


def _max_and_argmax_pallas(span, obj):
    A, M, D = span.shape
    C, R, _ = obj.shape
    obj = obj.astype(span.dtype)    # one MXU dtype inside the kernel
    flat = span.reshape(A * M, D)
    rows = A * M
    tile = min(ROW_TILE, rows)
    c_pad = -C % C_TILE
    if c_pad:
        obj = jnp.pad(obj, ((0, c_pad), (0, 0), (0, 0)))
    Cp = C + c_pad
    grid = (pl.cdiv(rows, tile), Cp // C_TILE)

    mx, am = pl.pallas_call(
        _pallas_kernel,
        grid=grid,
        # interpret on non-TPU backends so CPU tests cover the kernel
        # ('axon' = TPU behind the tunnel PJRT plugin)
        interpret=jax.default_backend() not in ("tpu", "axon"),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_TILE, R, D), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C_TILE, tile), lambda i, c: (c, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_TILE, tile), lambda i, c: (c, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, rows), jnp.float32),
            jax.ShapeDtypeStruct((Cp, rows), jnp.int32),
        ],
    )(flat, obj)
    # (Cp, A*M) -> (A, C, M)
    mx = jnp.moveaxis(mx[:C].reshape(C, A, M), 0, 1)
    am = jnp.moveaxis(am[:C].reshape(C, A, M), 0, 1)
    return mx, am


_IMPLS = {
    "einsum": _max_and_argmax_einsum,
    "chunked": _max_and_argmax_chunked,
    "pallas": _max_and_argmax_pallas,
}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def span_region_max(span, obj, impl: str = "einsum"):
    """(A, M, D) x (C, R, D) -> (A, C, M) best-region scores."""
    return _IMPLS[impl](span, obj)[0]


def _fwd(span, obj, impl):
    mx, am = _IMPLS[impl](span, obj)
    return mx, (span, obj, am)


BWD_CHUNK = 16


def _bwd_w(g_ref, am_ref, R, cdt):
    """The g-weighted argmax one-hot ``W (tile, C*R)``, built on lanes.

    ``W[t, r*C+c] = g[t, c] * (am[t, c] == r)`` -- the matmul operand that
    encodes both backward einsums without the (A, C, M, R) one-hot ever
    existing in HBM.
    """
    tile, C = g_ref.shape
    lanes = C * R
    # r-major lanes (l = r*C + c): the C-periodic tiling is a lane
    # concatenation, which Mosaic lowers directly (jnp.repeat's
    # lane-collapsing reshape does not)
    g_t = jnp.concatenate([g_ref[...]] * R, axis=1)        # (tile, R*C)
    am_t = jnp.concatenate([am_ref[...]] * R, axis=1)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, lanes), 1) // C
    return jnp.where(am_t == r_iota, g_t, 0.0).astype(cdt)


def _dspan_kernel(R, cdt, g_ref, am_ref, obj_ref, out_ref):
    """dspan[t] += W[t, cb] @ obj_block  ((tile, cblk*R) @ (cblk*R, D)),
    accumulated over the image-block grid axis cb (the fast axis, so out
    revisits stay contiguous).  Blocking over images keeps VMEM bounded:
    the unblocked variant compiled up to C=256 but failed Mosaic
    scoped-VMEM at C=512 (B=512 contrastive batches, measured)."""
    w = _bwd_w(g_ref, am_ref, R, cdt)
    acc = jax.lax.dot_general(
        w, obj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cb = pl.program_id(1)

    @pl.when(cb == 0)
    def _init():
        out_ref[...] = acc

    @pl.when(cb > 0)
    def _acc():
        out_ref[...] += acc


def _dobj_kernel(R, Rblk, cdt, g_ref, am_ref, span_ref, out_ref):
    """dobj[r*C+c] += W^T[r*C+c] @ span_tile for r in this region block,
    accumulated over row tiles (i, the fast grid axis)."""
    tile, C = g_ref.shape
    lanes = Rblk * C
    rb = pl.program_id(0)
    g_t = jnp.concatenate([g_ref[...]] * Rblk, axis=1)     # (tile, Rblk*C)
    am_t = jnp.concatenate([am_ref[...]] * Rblk, axis=1)
    r_iota = (jax.lax.broadcasted_iota(jnp.int32, (tile, lanes), 1) // C
              + rb * Rblk)
    w = jnp.where(am_t == r_iota, g_t, 0.0).astype(cdt)
    acc = jax.lax.dot_general(
        w, span_ref[...].astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = acc

    @pl.when(i > 0)
    def _acc():
        out_ref[...] += acc


DSPAN_TILE = 256
DOBJ_TILE = 256
# images per dspan block: bounds the (tile, R*cblk) lane tiles + the
# double-buffered (R*cblk, D) obj block at any batch size (the unblocked
# kernel OOMed Mosaic at C=512).  128 = the Mosaic lane-divisibility
# minimum for a partial block (a block of the FULL C is always legal,
# so C < 128 keeps the original single-block layout).
DSPAN_CBLK = 128


def _dobj_rblk(R: int, C: int, D: int) -> int:
    """Largest divisor of R whose (Rblk*C, D) f32 out block is <= ~2.5MB
    (the block is double-buffered; the full (R*C, D) accumulator was a
    VMEM-stack OOM at production sizes)."""
    for rb in sorted((d for d in range(1, R + 1) if R % d == 0),
                     reverse=True):
        if rb * C * D * 4 <= 2_500_000:
            return rb
    return 1


def _bwd_pallas(span, obj, am, g):
    """Fused backward: two kernels (dspan blocked over rows; dobj's full
    (C*R, D) accumulator resident in VMEM across row tiles), matmuls in
    the span dtype (bf16 in the production path -- the scan-based
    backward runs them f32).  The (A, C, M, R) one-hot never exists."""
    A, M, D = span.shape
    C, R, _ = obj.shape
    cdt = span.dtype
    rows = A * M
    if rows >= DSPAN_TILE:
        tile, tile2 = DSPAN_TILE, DOBJ_TILE  # tile2 divides tile
        r_pad = -rows % tile
    else:
        tile = tile2 = rows  # single full-row block
        r_pad = 0

    flat = span.reshape(rows, D)
    g2 = jnp.moveaxis(g, 1, 2).reshape(rows, C)        # (rows, C) f32
    am2 = jnp.moveaxis(am, 1, 2).reshape(rows, C)
    if r_pad:
        # zero-padded g rows contribute nothing (their W rows are 0)
        flat = jnp.pad(flat, ((0, r_pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, r_pad), (0, 0)))
        am2 = jnp.pad(am2, ((0, r_pad), (0, 0)))
    rows_p = rows + r_pad
    interp = jax.default_backend() not in ("tpu", "axon")

    # dspan blocks over images in chunks of cblk: within a block, obj
    # rows are r-major (l = r*cblk + c') to match _bwd_w's lane order;
    # zero-padded g columns contribute zero W rows
    cblk = min(C, DSPAN_CBLK)
    c_pad = -C % cblk
    obj_b = obj.astype(cdt)
    g2b, am2b = g2, am2
    if c_pad:
        obj_b = jnp.pad(obj_b, ((0, c_pad), (0, 0), (0, 0)))
        g2b = jnp.pad(g2b, ((0, 0), (0, c_pad)))
        am2b = jnp.pad(am2b, ((0, 0), (0, c_pad)))
    Cb = (C + c_pad) // cblk
    obj_b = (obj_b.reshape(Cb, cblk, R, D).swapaxes(1, 2)
             .reshape(Cb * R * cblk, D))

    dspan = pl.pallas_call(
        functools.partial(_dspan_kernel, R, cdt),
        grid=(rows_p // tile, Cb),
        interpret=interp,
        in_specs=[
            pl.BlockSpec((tile, cblk), lambda i, cb: (i, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cblk), lambda i, cb: (i, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R * cblk, D), lambda i, cb: (cb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda i, cb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, D), jnp.float32),
    )(g2b, am2b, obj_b)[:rows]

    rblk = _dobj_rblk(R, C, D)
    dobj = pl.pallas_call(
        functools.partial(_dobj_kernel, R, rblk, cdt),
        grid=(R // rblk, rows_p // tile2),
        interpret=interp,
        in_specs=[
            pl.BlockSpec((tile2, C), lambda rb, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile2, C), lambda rb, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile2, D), lambda rb, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rblk * C, D), lambda rb, i: (rb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * C, D), jnp.float32),
    )(g2, am2, flat)
    dobj = jnp.moveaxis(dobj.reshape(R, C, D), 0, 1)

    return (dspan.reshape(A, M, D).astype(span.dtype),
            dobj.astype(obj.dtype))


def _bwd(impl, res, g):
    span, obj, am = res
    if impl == "pallas":
        return _bwd_pallas(span, obj, am, g)
    A, M, D = span.shape
    C, R, _ = obj.shape

    # scan over image *chunks*: never materialize (A, C, M, R) or
    # (A, C, M, D); chunking keeps each step MXU-sized
    ch = min(BWD_CHUNK, C)
    pad = -C % ch
    if pad:
        obj_p = jnp.pad(obj, ((0, pad), (0, 0), (0, 0)))
        am_p = jnp.pad(am, ((0, 0), (0, pad), (0, 0)))
        g_p = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    else:
        obj_p, am_p, g_p = obj, am, g
    Cp = C + pad
    nch = Cp // ch

    def body(dspan, inputs):
        obj_c, am_c, g_c = inputs     # (ch, R, D), (A, ch, M), (A, ch, M)
        onehot = jax.nn.one_hot(am_c, R, dtype=g.dtype)  # (A, ch, M, R)
        w = onehot * g_c[..., None]                      # weighted one-hot
        # dspan[a,m] += sum_c g * obj[c, am]; accumulate f32 regardless of
        # the primal dtype (span may be bf16 when charts are bf16-stored)
        dspan = dspan + jnp.einsum("acmr,crd->amd", w, obj_c,
                                   preferred_element_type=jnp.float32)
        # dobj[c,r] += sum_{a,m: am=r} g * span[a,m]
        dobj_c = jnp.einsum("acmr,amd->crd", w, span,
                            preferred_element_type=jnp.float32)
        return dspan, dobj_c

    dspan, dobj = jax.lax.scan(
        body, jnp.zeros(span.shape, jnp.float32),
        (obj_p.reshape(nch, ch, R, D),
         jnp.moveaxis(am_p.reshape(A, nch, ch, M), 1, 0),
         jnp.moveaxis(g_p.reshape(A, nch, ch, M), 1, 0)))
    dobj = dobj.reshape(Cp, R, D)[:C]
    return dspan.astype(span.dtype), dobj.astype(obj.dtype)


span_region_max.defvjp(_fwd, _bwd)
