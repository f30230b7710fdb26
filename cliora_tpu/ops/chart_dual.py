"""Dual-chart inside/outside passes: every access is a rectangular slice.

The gather formulation (ops/chart_pass.py) is fast forward but its
backward turns every ``jnp.take`` into a scatter-add over the whole chart
-- measured ~3x the forward cost on TPU.  This module removes all gathers
AND all per-split stacking by keeping every chart in two layouts:

  * start-indexed: ``X_s[level, start]``  = cell (level, start)
  * end-indexed:   ``X_e[level, end]``    = cell (level, end - level - 1)

With both views, the full level-``l`` inside update reads exactly two
contiguous (B, N, L, D) blocks:

  left  children (k, p)          = X_s[0:N, 0:L]
  right children (l-k-1, p+k+1)  : their END is p+l+1, so
                                 = flip_k(X_e[0:N, l+1 : l+1+L])

and the outside update reads four (parents from the outside charts,
siblings from the inside charts), with validity masks instead of index
arithmetic:

  left-extension  d (combo row d-1, valid when d <= p):
      parent (l+d, p-d) = O_e[l+1 : l+L, l+1 : l+1+L]
      sibling (d-1, p-d) = I_e[0 : L-1, 0 : L]
  right-extension e (valid when p <= L-1-e):
      parent (l+e, p)       = O_s[l+1 : l+L, 0 : L]
      sibling (e-1, p+l+1)  = I_s[0 : L-1, l+1 : l+1+L]

Each new level row is written to both views (two slice writes).  The
whole recursion is slices, flips, pads and batched matmuls -- transposes
of which are again slices and pads, so the backward pass costs ~the same
as the forward instead of 3x.

Numerics match ops/chart_pass.py exactly for the inside pass (same
per-target split order); the outside derivation softmax sees the same
combo *set* per target (order permuted -- softmax is order-invariant).
(reference math: cliora/net/diora.py:100-200, cliora/net/cliora.py:103-208)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.ops.core import bilinear, compose_mlp, normalize, region_attention

NEG_INF = -1e9


def _compute_dtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def inside_pass_dual(
    cfg: ModelConfig,
    dp,
    h0: jax.Array,
    obj: Optional[jax.Array] = None,
    rng=None,
    train: bool = False,
    with_cky: bool = False,
):
    """Returns (h_s, s_s, cky_bp_s, cky_val_s), all start-indexed
    (B, n, n+1, ...) dense charts (cols [0, n-level) valid per row)."""
    B, n, D = h0.shape
    cp = dp["inside_compose"]
    mat = dp["inside_score"]["mat"]

    h_s = jnp.zeros((B, n, n + 1, D), h0.dtype).at[:, 0, :n].set(h0)
    h_e = jnp.zeros((B, n, n + 1, D), h0.dtype).at[:, 0, 1:n + 1].set(h0)
    s_s = jnp.zeros((B, n, n + 1), jnp.float32)
    s_e = jnp.zeros((B, n, n + 1), jnp.float32)
    cv_s = cv_e = bp_s = None
    if with_cky:
        cv_s = jnp.zeros((B, n, n + 1), jnp.float32).at[:, 0, :n].set(1.0)
        cv_e = jnp.zeros((B, n, n + 1), jnp.float32).at[:, 0, 1:].set(1.0)
        bp_s = jnp.zeros((B, n, n + 1), jnp.int32)

    for level in range(1, n):
        L, N = n - level, level
        lh = h_s[:, :N, :L]                          # (B, N, L, D)
        ls = s_s[:, :N, :L]
        rh = h_e[:, :N, level + 1:level + 1 + L][:, ::-1]
        rs = s_e[:, :N, level + 1:level + 1 + L][:, ::-1]

        hc = compose_mlp(cp, lh, rh, compute_dtype=_compute_dtype(cfg))
        sc = bilinear(mat, lh, rh) + ls + rs         # (B, N, L)

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

        h_s = h_s.at[:, level, :L].set(h_agg)
        h_e = h_e.at[:, level, level + 1:level + 1 + L].set(h_agg)
        s_s = s_s.at[:, level, :L].set(s_agg)
        s_e = s_e.at[:, level, level + 1:level + 1 + L].set(s_agg)

        if with_cky:
            s_norm = sc - jnp.max(sc, axis=1, keepdims=True)
            lv = cv_s[:, :N, :L]
            rv = cv_e[:, :N, level + 1:level + 1 + L][:, ::-1]
            ps = lv + rv + s_norm
            best = jnp.max(ps, axis=1)
            cv_s = cv_s.at[:, level, :L].set(best)
            cv_e = cv_e.at[:, level, level + 1:level + 1 + L].set(best)
            bp_s = bp_s.at[:, level, :L].set(
                jnp.argmax(ps, axis=1).astype(jnp.int32))

    return (h_s, h_e), (s_s, s_e), bp_s, cv_s


def outside_pass_dual(
    cfg: ModelConfig,
    dp,
    inside_h,    # (h_s, h_e) from inside_pass_dual
    inside_s,    # (s_s, s_e)
):
    i_hs, i_he = inside_h
    i_ss, i_se = inside_s
    B, n, _, D = i_hs.shape
    cp = dp.get("outside_compose", dp["inside_compose"])
    mat = dp.get("outside_score", dp["inside_score"])["mat"]

    if cfg.compress:
        root = i_hs[:, n - 1, 0:1] @ dp["root_mat_out"]
    else:
        root = jnp.broadcast_to(
            dp["root_vector_out_h"].reshape(1, 1, D), (B, 1, D))
    root = normalize(cfg.normalize, root)

    o_s = jnp.zeros((B, n, n + 1, D), jnp.float32).at[
        :, n - 1, 0:1].set(root)
    o_e = jnp.zeros((B, n, n + 1, D), jnp.float32).at[
        :, n - 1, n:n + 1].set(root)
    os_s = jnp.zeros((B, n, n + 1), jnp.float32)
    os_e = jnp.zeros((B, n, n + 1), jnp.float32)

    p_grid = jnp.arange(n, dtype=jnp.int32)
    d_grid = jnp.arange(1, n, dtype=jnp.int32)

    for level in range(n - 2, -1, -1):
        L = n - level
        K = L - 1

        # left-extension: combo row d-1 for d=1..K, valid iff d <= p
        par_h_L = o_e[:, level + 1:level + 1 + K, level + 1:level + 1 + L]
        par_s_L = os_e[:, level + 1:level + 1 + K, level + 1:level + 1 + L]
        sib_h_L = i_he[:, :K, :L]
        sib_s_L = i_se[:, :K, :L]
        mask_L = d_grid[:K, None] <= p_grid[None, :L]    # (K, L)

        # right-extension: combo row e-1 for e=1..K, valid iff p <= L-1-e
        par_h_R = o_s[:, level + 1:level + 1 + K, :L]
        par_s_R = os_s[:, level + 1:level + 1 + K, :L]
        sib_h_R = i_hs[:, :K, level + 1:level + 1 + L]
        sib_s_R = i_ss[:, :K, level + 1:level + 1 + L]
        mask_R = p_grid[None, :L] <= (L - 1) - d_grid[:K, None]

        sib_h = jnp.concatenate([sib_h_L, sib_h_R], axis=1)
        par_h = jnp.concatenate([par_h_L, par_h_R], axis=1)
        hc = compose_mlp(cp, sib_h, par_h,
                         compute_dtype=_compute_dtype(cfg))
        sc = (bilinear(mat, sib_h, par_h)
              + jnp.concatenate([sib_s_L + par_s_L, sib_s_R + par_s_R],
                                axis=1))
        mask = jnp.concatenate([mask_L, mask_R], axis=0)[None]  # (1,2K,L)
        sc = jnp.where(mask, sc, NEG_INF)

        p = jax.nn.softmax(sc, axis=1)
        h_agg = jnp.einsum("bnld,bnl->bld", hc, p)
        s_agg = jnp.sum(jnp.where(mask, sc, 0.0) * p, axis=1)
        h_agg = normalize(cfg.normalize, h_agg)

        o_s = o_s.at[:, level, :L].set(h_agg)
        o_e = o_e.at[:, level, level + 1:level + 1 + L].set(h_agg)
        os_s = os_s.at[:, level, :L].set(s_agg)
        os_e = os_e.at[:, level, level + 1:level + 1 + L].set(s_agg)

    return (o_s, o_e), (os_s, os_e)


def start_chart_to_flat(x_s: jax.Array) -> jax.Array:
    """(B, n, n+1, ...) start-indexed dense chart -> flat (B, ncells, ...)."""
    n = x_s.shape[1]
    rows = [x_s[:, level, : n - level] for level in range(n)]
    return jnp.concatenate(rows, axis=1)
