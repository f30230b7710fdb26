"""Slice-based inside/outside passes over a dense (B, n, n, D) chart.

The flat-chart passes (ops/chart_pass.py) follow the reference's
gather/scatter formulation (index_select over a flat cell axis).  On TPU,
gathers lower to slow dynamic-gather loops; this module reformulates the
recursion so every child/parent access is a *static contiguous slice* of
a dense ``chart[level, pos]`` tensor:

  inside, target (level l, pos p), split k:
    left  child (k, p)           -> row k,      cols [0, L)
    right child (l-k-1, p+k+1)   -> row l-k-1,  cols [k+1, k+1+L)
  so each split k touches two contiguous row-slices; all L targets of a
  level update in one batched matmul per split.

  outside, target (l, p), combos regrouped by extension distance:
    left-extension  d: parent (l+d, p-d), sibling (d-1, p-d)
      -> rows l+d / d-1, cols [0, L-d), targets p in [d, L)
    right-extension e: parent (l+e, p),  sibling (e-1, p+l+1)
      -> rows l+e / e-1, cols [0, L-e) / [l+1, l+1+L-e), targets [0, L-e)
  total slice work Sum_d 2(L-d) == N*L: zero redundancy; invalid target
  positions are -inf-masked out of the derivation softmax.

Outputs are converted back to the flat layout, bit-compatible with
chart_pass.py (same math, same reduction order per target).
(reference math: cliora/net/diora.py:100-200, cliora/net/cliora.py:103-208)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


from cliora_tpu.chart.offsets import level_offsets
from cliora_tpu.models.config import ModelConfig
from cliora_tpu.ops.core import bilinear, compose_mlp, normalize, region_attention

NEG_INF = -1e9


def flat_to_dense(flat: jax.Array, n: int) -> jax.Array:
    """(B, ncells, ...) -> (B, n, n, ...) with [level, pos] rows."""
    offs = level_offsets(n)
    rows = []
    for level in range(n):
        L = n - level
        row = flat[:, int(offs[level]):int(offs[level]) + L]
        pad = [(0, 0), (0, level)] + [(0, 0)] * (flat.ndim - 2)
        rows.append(jnp.pad(row, pad))
    return jnp.stack(rows, axis=1)


def dense_to_flat(dense: jax.Array) -> jax.Array:
    """(B, n, n, ...) -> (B, ncells, ...)."""
    n = dense.shape[1]
    rows = [dense[:, level, : n - level] for level in range(n)]
    return jnp.concatenate(rows, axis=1)


def inside_pass_dense(
    cfg: ModelConfig,
    dp,
    h0: jax.Array,
    obj: Optional[jax.Array] = None,
    rng=None,
    train: bool = False,
    with_cky: bool = False,
):
    """Slice-based inside pass.  Same outputs as chart_pass.inside_pass
    (flat layout), mlp arch."""
    B, n, D = h0.shape
    cp = dp["inside_compose"]
    mat = dp["inside_score"]["mat"]

    h = jnp.zeros((B, n, n, D), h0.dtype).at[:, 0, :, :].set(h0)
    s = jnp.zeros((B, n, n), jnp.float32)
    cky_val = jnp.zeros((B, n, n), jnp.float32) if with_cky else None
    cky_val = (cky_val.at[:, 0, :].set(1.0) if with_cky else None)
    cky_bp = jnp.zeros((B, n, n), jnp.int32) if with_cky else None

    for level in range(1, n):
        L, N = n - level, level
        lh = h[:, :N, :L]                                 # (B, N, L, D)
        ls = s[:, :N, :L]                                 # (B, N, L)
        rh = jnp.stack(
            [h[:, level - k - 1, k + 1:k + 1 + L] for k in range(N)],
            axis=1)                                       # (B, N, L, D)
        rs = jnp.stack(
            [s[:, level - k - 1, k + 1:k + 1 + L] for k in range(N)],
            axis=1)

        hc = compose_mlp(cp, lh, rh, compute_dtype=(
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
            else jnp.float32))                            # (B, N, L, D)
        sc = bilinear(mat, lh, rh) + ls + rs              # (B, N, L)

        p = jax.nn.softmax(sc, axis=1)
        h_agg = jnp.einsum("bnld,bnl->bld", hc, p)
        s_agg = jnp.sum(sc * p, axis=1)

        h_agg = normalize(cfg.normalize, h_agg)
        if cfg.use_obj:
            lrng = jax.random.fold_in(rng, level) if rng is not None \
                else None
            cxt = region_attention(
                h_agg, obj, temp=cfg.attn_temp,
                dropout=cfg.attn_dropout, rng=lrng, train=train)
            h_agg = normalize(cfg.normalize, h_agg + cxt)

        h = h.at[:, level, :L].set(h_agg)
        s = s.at[:, level, :L].set(s_agg)

        if with_cky:
            s_norm = sc - jnp.max(sc, axis=1, keepdims=True)
            lv = cky_val[:, :N, :L]
            rv = jnp.stack(
                [cky_val[:, level - k - 1, k + 1:k + 1 + L]
                 for k in range(N)], axis=1)
            ps = lv + rv + s_norm                          # (B, N, L)
            cky_val = cky_val.at[:, level, :L].set(jnp.max(ps, axis=1))
            cky_bp = cky_bp.at[:, level, :L].set(
                jnp.argmax(ps, axis=1).astype(jnp.int32))

    return h, s, cky_bp, cky_val


def outside_pass_dense(
    cfg: ModelConfig,
    dp,
    inside_h_dense: jax.Array,
    inside_s_dense: jax.Array,
):
    """Slice-based outside pass (mirror of chart_pass.outside_pass).

    Combos are regrouped by (direction, distance); the derivation softmax
    per target masks padded positions.  Numerics: softmax over the same
    combo set per target as the flat path (order-permuted, sum-equal).
    """
    B, n, _, D = inside_h_dense.shape
    cp = dp.get("outside_compose", dp["inside_compose"])
    mat = dp.get("outside_score", dp["inside_score"])["mat"]

    if cfg.compress:
        root = inside_h_dense[:, n - 1, 0:1] @ dp["root_mat_out"]
    else:
        root = jnp.broadcast_to(
            dp["root_vector_out_h"].reshape(1, 1, D), (B, 1, D))
    root = normalize(cfg.normalize, root)

    oh = jnp.zeros((B, n, n, D), jnp.float32).at[:, n - 1, 0:1].set(root)
    os_ = jnp.zeros((B, n, n), jnp.float32)

    for level in range(n - 2, -1, -1):
        L = n - level
        hs, ss, masks = [], [], []

        for d in range(1, L):
            V = L - d  # valid targets per direction at this distance
            # left-extension: parent (level+d, p-d), sibling (d-1, p-d),
            # targets p in [d, L)
            par = oh[:, level + d, :V]
            sib = inside_h_dense[:, d - 1, :V]
            pss = os_[:, level + d, :V]
            sbs = inside_s_dense[:, d - 1, :V]
            hcomp = compose_mlp(cp, sib, par)
            scomp = bilinear(mat, sib, par) + sbs + pss
            pad = ((0, 0), (d, 0), (0, 0))
            hs.append(jnp.pad(hcomp, pad))
            ss.append(jnp.pad(scomp, ((0, 0), (d, 0)),
                              constant_values=NEG_INF))

            # right-extension: parent (level+d, p),
            # sibling (d-1, p+level+1), targets p in [0, L-d)
            par = oh[:, level + d, :V]
            sib = inside_h_dense[:, d - 1, level + 1:level + 1 + V]
            pss = os_[:, level + d, :V]
            sbs = inside_s_dense[:, d - 1, level + 1:level + 1 + V]
            hcomp = compose_mlp(cp, sib, par)
            scomp = bilinear(mat, sib, par) + sbs + pss
            pad = ((0, 0), (0, d), (0, 0))
            hs.append(jnp.pad(hcomp, pad))
            ss.append(jnp.pad(scomp, ((0, 0), (0, d)),
                              constant_values=NEG_INF))

        hall = jnp.stack(hs, axis=1)          # (B, 2(L-1), L, D)
        sall = jnp.stack(ss, axis=1)          # (B, 2(L-1), L)
        p = jax.nn.softmax(sall, axis=1)
        h_agg = jnp.einsum("bnld,bnl->bld", hall, p)
        s_agg = jnp.sum(jnp.where(sall <= NEG_INF / 2, 0.0, sall) * p,
                        axis=1)
        h_agg = normalize(cfg.normalize, h_agg)

        oh = oh.at[:, level, :L].set(h_agg)
        os_ = os_.at[:, level, :L].set(s_agg)

    return oh, os_
