"""Functional inside / outside chart passes.

The chart is a value: ``(B, ncells, D)`` arrays produced by a traced
Python loop over levels inside ``jit`` -- one gather / compose / score /
softmax / aggregate / scatter block per level, which XLA fuses per level.
Mirrors the math of the reference's mutate-in-place passes
(reference: cliora/net/diora.py:100-200,295-401 and
cliora/net/cliora.py:103-208,304-414) with these TPU-native changes:

  * gather indices are baked int32 constants (see chart/indices.py);
  * the CKY argmax decode is fused into the inside pass: split scores are
    max-normalized per cell (the reference does this in a monkey-patched
    hook, cliora/analysis/utils.py:78-95) and reduced to a single
    ``(B, ncells)`` backpointer array on device, replacing the reference's
    per-cell host-sync Python CKY (cliora/analysis/cky.py:31-99);
  * the vestigial LSTM cell-state chart ("c"), identically zero in the MLP
    arch (cliora/net/diora.py:61,70), is only materialized for the
    TreeLSTM arch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cliora_tpu.chart.indices import INDEX
from cliora_tpu.chart.offsets import level_offsets, ncells
from cliora_tpu.models.config import ModelConfig
from cliora_tpu.ops.core import (
    bilinear,
    compose_mlp,
    compose_treelstm,
    lowp_einsum,
    normalize,
    region_attention,
)


class InsideOut(NamedTuple):
    inside_h: jax.Array            # (B, ncells, D)
    inside_s: jax.Array            # (B, ncells, 1)
    inside_c: Optional[jax.Array]  # (B, ncells, D) | None (mlp arch)
    outside_h: Optional[jax.Array]
    outside_s: Optional[jax.Array]
    outside_c: Optional[jax.Array]
    cky_bp: Optional[jax.Array]    # (B, ncells) int32 argmax split per cell
    cky_val: Optional[jax.Array]   # (B, ncells) CKY chart values


def compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _take(x, idx, axis=1, name=None):
    """Chart gather with baked constant indices.

    Every chart index is built host-side from the span algebra
    (chart/indices.py) and is in-bounds by construction (validated by the
    brute-force enumeration tests), so ``promise_in_bounds`` lets XLA skip
    the clamp in the gather AND in its transpose scatter-add -- the chart
    scatters are ~2.6 ms of the 29.4 ms production step (profile,
    BASELINE.md round 3).

    ``name``: checkpoint-name tag (see CHILD_RESIDS) so the 'gathers'
    remat policy can recompute this gather in the backward instead of
    storing its (B, rows, D) result."""
    assert axis == 1
    out = x.at[:, idx].get(mode="promise_in_bounds")
    if name is not None:
        out = jax.ad_checkpoint.checkpoint_name(out, name)
    return out


# Residual tag for the 'gathers' remat policy: the per-level chart-child
# gathers (lh/rh inside, ph/sh outside) and the compose concat.  The tag
# does exclude the gathers from the residual set (verified with
# print_saved_residuals), but the policy is a measured NEGATIVE overall
# -- see _checkpoint below.
CHILD_RESIDS = "chart_children"


# Calibrated stored-activation copy factor for the auto-remat estimate:
# measured live memory of the unremated bf16 CLIORA step at B=128, n=40,
# D=400 is 18.2 GB (BASELINE.md); the gathered-children row count over
# both passes is (n^3-n)/2, giving ~5.6 effective stored copies of the
# (rows, D) chart-dtype tensors (gathers, compose intermediates,
# weighted-agg operands).  Reproduces every measured fit/OOM point:
# B=64/n=40 (9.1 GB, fits), B=128/n=20 (4.6 GB), B=256/n=20 (9.1 GB).
_ACT_COPY_FACTOR = 5.6


def remat_enabled(cfg: ModelConfig, B: int, n: int, D: int) -> bool:
    """Per-compiled-shape remat decision.

    ``cfg.remat`` True/False force it.  "auto" estimates the step's
    stored-activation bytes at trace time (shapes are static under jit)
    and remats only when the estimate exceeds ``cfg.remat_budget_gb`` --
    so under mixed-length bucketing the short buckets keep full speed
    (remat costs ~30% when not needed, BASELINE.md L=20 table) while the
    long buckets still fit HBM.
    """
    if cfg.remat is True:
        return True
    if not cfg.remat:
        return False
    itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
    rows = (n ** 3 - n) // 2     # inside (n^3-n)/6 + outside (n^3-n)/3
    est = _ACT_COPY_FACTOR * B * D * rows * itemsize
    return est > cfg.remat_budget_gb * 2 ** 30


def _checkpoint(cfg: ModelConfig, fn):
    """``jax.checkpoint`` with the configured residual policy.

    'full' stores nothing beyond the level inputs; 'dots' additionally
    saves dot_general outputs (compose fc0/fc1, bilinear) so the backward
    recomputes only gathers + elementwise -- the middle point of the
    memory/recompute trade; 'gathers' saves everything EXCEPT the
    CHILD_RESIDS-tagged chart gathers, recomputing those from the charts.
    Both non-'full' policies are MEASURED NEGATIVES at the L=40 B=128
    envelope (BASELINE.md round-4 grid): 'gathers' needs 27.3 GB --
    save-anything-except keeps redundant elementwise residuals (pre-act,
    relu mask, broadcast -- verified with print_saved_residuals) and the
    compose concat, inflating storage past even the unremated 18.2 GB.
    """
    if cfg.remat_policy == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_saveable)
    if cfg.remat_policy == "gathers":
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                CHILD_RESIDS))
    return jax.checkpoint(fn)


def _remat_level(cfg: ModelConfig, enabled: bool, cells: int,
                 peak_cells: int) -> bool:
    """Whether a level step with ``(B, cells, D)`` intermediates should be
    checkpointed, given the pass's largest level ``peak_cells``.

    Inside: cells = (n-level)*level, a parabola peaking mid-chart at
    ~n^2/4.  Outside: cells = (n-level)*(n-level-1), peaking at n(n-1)
    at level 0.  With ``remat_frac`` > 0 only levels within that fraction
    of the pass's peak are rematerialized: the small levels are cheap to
    store and skipping them cuts recompute roughly in proportion to their
    FLOP share (see ModelConfig.remat_frac).
    """
    if not enabled:
        return False
    return cells >= cfg.remat_frac * peak_cells


def _weighted_agg(pattern: str, h, p):
    """Softmax-weighted aggregation ``einsum(pattern, h, p)``.

    Runs through :func:`lowp_einsum` so that with bf16 charts the
    backward produces ``dh`` directly in bf16 (plain autodiff would
    materialize an f32 copy of the big ``(B, L, N, D)`` composed tensor
    in the transpose); only ``dp`` (the softmax cotangent) accumulates
    f32.  The output stays in the chart dtype -- together with the
    dtype-preserving unit_norm and attention context this keeps the whole
    level block convert-free.  Identical numerics to the plain einsum for
    f32 charts.
    """
    return lowp_einsum(pattern, h, p, h.dtype, h.dtype)


def _compose(cfg: ModelConfig, cp, lh, rh, lc, rc):
    dtype = compute_dtype(cfg)
    if cfg.arch == "treelstm":
        return compose_treelstm(cp, (lh, lc), (rh, rc), compute_dtype=dtype)
    # out_dtype == compute dtype: the h-charts are stored in the compute
    # dtype (see inside_pass), so no f32 round-trip is materialized on the
    # (B, L*N, D) composed tensor -- the convert_element_type traffic was
    # ~12 ms/step of the bf16 B=128 L=20 D=400 train step before this
    return compose_mlp(cp, lh, rh, compute_dtype=dtype, out_dtype=dtype,
                       residual_name=CHILD_RESIDS), None


def inside_pass(
    cfg: ModelConfig,
    dp,
    h0,
    c0=None,
    obj=None,
    rng=None,
    train: bool = False,
    with_cky: bool = False,
):
    """Bottom-up pass.  ``h0``: (B, n, D) normalized leaf vectors.

    Returns (inside_h, inside_s, inside_c, cky_bp, cky_val).
    """
    B, n, D = h0.shape
    NC = ncells(n)
    offs = level_offsets(n)
    use_c = cfg.arch == "treelstm"
    cdt = compute_dtype(cfg)

    # h-charts live in the compute dtype: gathered children then feed the
    # compose/score matmuls with no per-level converts (in bf16 mode this
    # also halves chart HBM traffic).  Scores and softmaxes stay f32.
    # The region tensor is likewise cast once, not per level.
    if obj is not None:
        obj = obj.astype(cdt)
    inside_h = jnp.zeros((B, NC, D), cdt).at[:, :n].set(h0.astype(cdt))
    inside_s = jnp.zeros((B, NC, 1), jnp.float32)
    inside_c = None
    if use_c:
        c0 = jnp.zeros_like(h0) if c0 is None else c0
        inside_c = jnp.zeros((B, NC, D), cdt).at[:, :n].set(c0.astype(cdt))

    cky_val = jnp.ones((B, NC), jnp.float32) if with_cky else None
    cky_bp = jnp.zeros((B, NC), jnp.int32) if with_cky else None

    cp = dp["inside_compose"]
    mat = dp["inside_score"]["mat"]
    do_remat = remat_enabled(cfg, B, n, D)

    for level in range(1, n):
        L, N = n - level, level
        idx_l, idx_r = INDEX.inside(n, level)

        def level_step(inside_h, inside_s, inside_c, obj, lrng,
                       idx_l=idx_l, idx_r=idx_r, L=L, N=N):
            lh = _take(inside_h, idx_l, axis=1,
                       name=CHILD_RESIDS)         # (B, L*N, D)
            rh = _take(inside_h, idx_r, axis=1, name=CHILD_RESIDS)
            lc = _take(inside_c, idx_l, axis=1) if use_c else None
            rc = _take(inside_c, idx_r, axis=1) if use_c else None

            h, c = _compose(cfg, cp, lh, rh, lc, rc)

            s_bil = bilinear(mat, lh, rh, compute_dtype=cdt)  # (B, L*N)
            ls = _take(inside_s, idx_l, axis=1)[..., 0]
            rs = _take(inside_s, idx_r, axis=1)[..., 0]
            s = (s_bil + ls + rs).reshape(B, L, N)
            if cfg.aggregate == "hard":
                # greedy (S-DIORA-style): best split only
                p = jax.nn.one_hot(jnp.argmax(s, -1), N, dtype=s.dtype)
            else:
                p = jax.nn.softmax(s, axis=-1)       # softmax over splits

            h_agg = _weighted_agg("blnd,bln->bld",
                                  h.reshape(B, L, N, D), p)
            s_agg = jnp.sum(s * p, axis=-1)          # (B, L)

            h_agg = normalize(cfg.normalize, h_agg)
            if cfg.use_obj:
                # visual residual per level (reference: cliora.py:140-157)
                cxt = region_attention(
                    h_agg, obj, temp=cfg.attn_temp,
                    dropout=cfg.attn_dropout, rng=lrng, train=train,
                    compute_dtype=cdt)
                h_agg = normalize(cfg.normalize, h_agg + cxt)
            c_agg = None
            if use_c:
                c_agg = _weighted_agg("blnd,bln->bld",
                                      c.reshape(B, L, N, D), p)
                c_agg = normalize(cfg.normalize, c_agg)
            return h_agg, s_agg, c_agg, s

        # remat: store only the level's inputs (the charts) and the small
        # outputs; the (B, L*N, D) gather/compose intermediates are
        # recomputed in the backward (selective per remat_frac)
        step = (_checkpoint(cfg, level_step)
                if _remat_level(cfg, do_remat, L * N,
                                (n // 2) * (n - n // 2))
                else level_step)
        lrng = jax.random.fold_in(rng, level) if rng is not None else None
        h_agg, s_agg, c_agg, s = step(inside_h, inside_s, inside_c, obj,
                                      lrng)

        off = int(offs[level])
        inside_h = inside_h.at[:, off:off + L].set(h_agg.astype(cdt))
        inside_s = inside_s.at[:, off:off + L].set(s_agg[..., None])
        if use_c:
            inside_c = inside_c.at[:, off:off + L].set(c_agg.astype(cdt))

        if with_cky:
            s_norm = s - jnp.max(s, axis=-1, keepdims=True)
            lv = _take(cky_val, idx_l, axis=1).reshape(B, L, N)
            rv = _take(cky_val, idx_r, axis=1).reshape(B, L, N)
            ps = lv + rv + s_norm
            cky_val = cky_val.at[:, off:off + L].set(jnp.max(ps, axis=-1))
            cky_bp = cky_bp.at[:, off:off + L].set(
                jnp.argmax(ps, axis=-1).astype(jnp.int32))

    return inside_h, inside_s, inside_c, cky_bp, cky_val


MASK_NEG = -1e9  # finite -inf stand-in: keeps masked-softmax grads NaN-free


def _outside_masks(level: int, n: int, lengths):
    """Per-example validity masks at ``level`` for padded length buckets.

    ``combo_ok (B, N, L)``: the (parent, sibling) derivation's parent span
    lies inside ``[0, m)``  (same math as chart/indices.py outside_mask,
    but traced over the per-sentence lengths).
    ``target_ok (B, L)``: the target is a valid *non-root* cell -- the
    true root (level ``m-1``, pos 0) keeps its init value.
    """
    L = n - level
    N = L - 1
    m = lengths[:, None]                           # (B, 1)
    p = jnp.arange(L, dtype=jnp.int32)[None, :]    # (1, L)
    c = jnp.arange(N, dtype=jnp.int32)[:, None]    # (N, 1)
    j = p + level + 1                              # exclusive span end
    par_end = jnp.where(c < p, jnp.broadcast_to(j, (N, L)), j + c - p + 1)
    combo_ok = par_end[None] <= m[..., None]       # (B, N, L)
    target_ok = (j <= m) & (level < m - 1)         # (B, L)
    return combo_ok, target_ok


def outside_pass(
    cfg: ModelConfig,
    dp,
    inside_h,
    inside_s,
    inside_c=None,
    lengths=None,
):
    """Top-down pass mirroring :func:`inside_pass`.

    Parent states come from the *outside* chart, sibling states from the
    *inside* chart; compose input order is [sibling; parent] and the
    derivation softmax runs over the N parent/sibling combinations
    (reference: cliora/net/diora.py:152-200,337-376).

    ``lengths`` (B,) int32 enables padded length buckets: each sentence of
    true length ``m <= n`` reuses this length-``n`` program -- its root
    vector is planted at the true root cell ``(m-1, 0)``, derivations whose
    parent leaves ``[0, m)`` are masked out of the combo softmax, and
    invalid/root cells keep their prior values.  (Supersedes the
    reference's one-program-per-exact-length discipline,
    cliora/data/dataloader.py:11-113.)
    """
    B, NC, D = inside_h.shape
    # invert ncells = n(n+1)/2
    n = int(round(((8 * NC + 1) ** 0.5 - 1) / 2))
    assert ncells(n) == NC
    offs = level_offsets(n)
    use_c = cfg.arch == "treelstm"
    cdt = compute_dtype(cfg)
    if lengths is not None:
        assert not use_c, "padded buckets support the mlp arch only"

    cp = dp.get("outside_compose", dp["inside_compose"])
    mat = dp.get("outside_score", dp["inside_score"])["mat"]
    do_remat = remat_enabled(cfg, B, n, D)

    # Root initialization (reference: cliora/net/diora.py:337-356),
    # at the true per-example root cell when padded.
    if lengths is None:
        root_in = inside_h[:, -1]                       # (B, D)
    else:
        root_cell = jnp.asarray(offs, jnp.int32)[lengths - 1]   # (B,)
        root_in = inside_h[jnp.arange(B), root_cell]
    if cfg.compress:
        root_h = root_in @ dp["root_mat_out"]
    else:
        root_h = jnp.broadcast_to(
            dp["root_vector_out_h"].reshape(1, D), (B, D))
    root_h = normalize(cfg.normalize, root_h)

    outside_h = jnp.zeros((B, NC, D), cdt)
    root_h = root_h.astype(cdt)
    if lengths is None:
        outside_h = outside_h.at[:, -1].set(root_h)
    else:
        outside_h = outside_h.at[jnp.arange(B), root_cell].set(root_h)
    outside_s = jnp.zeros((B, NC, 1), jnp.float32)
    outside_c = jnp.zeros((B, NC, D), cdt) if use_c else None

    for level in range(n - 2, -1, -1):
        L = n - level
        N = L - 1
        par_idx, sis_idx = INDEX.outside(n, level)

        def level_step(outside_h, outside_s, outside_c, inside_h,
                       inside_s, inside_c, par_idx=par_idx,
                       sis_idx=sis_idx, level=level, L=L, N=N):
            ph = _take(outside_h, par_idx, axis=1,
                       name=CHILD_RESIDS)             # (B, N*L, D)
            sh = _take(inside_h, sis_idx, axis=1, name=CHILD_RESIDS)
            pc = _take(outside_c, par_idx, axis=1) if use_c else None
            sc = _take(inside_c, sis_idx, axis=1) if use_c else None

            h, c = _compose(cfg, cp, sh, ph, sc, pc)

            s_bil = bilinear(mat, sh, ph, compute_dtype=cdt)  # (B, N*L)
            ps_ = _take(outside_s, par_idx, axis=1)[..., 0]
            ss_ = _take(inside_s, sis_idx, axis=1)[..., 0]
            s = (s_bil + ss_ + ps_).reshape(B, N, L)
            target_ok = None
            if lengths is not None:
                combo_ok, target_ok = _outside_masks(level, n, lengths)
                s = jnp.where(combo_ok, s, MASK_NEG)
            if cfg.aggregate == "hard":
                p = jax.nn.one_hot(jnp.argmax(s, 1), N, dtype=s.dtype,
                                   axis=1)
            else:
                p = jax.nn.softmax(s, axis=1)        # softmax over combos

            h_agg = _weighted_agg("bnld,bnl->bld",
                                  h.reshape(B, N, L, D), p)
            s_agg = jnp.sum(s * p, axis=1)           # (B, L)

            h_agg = normalize(cfg.normalize, h_agg).astype(cdt)
            c_agg = None
            if use_c:
                c_agg = _weighted_agg("bnld,bnl->bld",
                                      c.reshape(B, N, L, D), p)
                c_agg = normalize(cfg.normalize, c_agg)
            return h_agg, s_agg, c_agg, target_ok

        step = (_checkpoint(cfg, level_step)
                if _remat_level(cfg, do_remat, N * L, n * (n - 1))
                else level_step)
        h_agg, s_agg, c_agg, target_ok = step(
            outside_h, outside_s, outside_c, inside_h, inside_s, inside_c)

        off = int(offs[level])
        if lengths is not None:
            # invalid targets and the true root keep their prior values
            # (no stop_gradient: the root cell's grad must reach the
            # root vector / compress matrix)
            h_agg = jnp.where(target_ok[..., None], h_agg,
                              outside_h[:, off:off + L])
            s_agg = jnp.where(target_ok, s_agg,
                              outside_s[:, off:off + L, 0])
        outside_h = outside_h.at[:, off:off + L].set(h_agg)
        outside_s = outside_s.at[:, off:off + L].set(s_agg[..., None])
        if use_c:
            outside_c = outside_c.at[:, off:off + L].set(c_agg.astype(cdt))

    return outside_h, outside_s, outside_c


def run_chart(
    cfg: ModelConfig,
    dp,
    h0,
    c0=None,
    obj=None,
    rng=None,
    train: bool = False,
    with_cky: bool = False,
    outside: bool = True,
    lengths=None,
) -> InsideOut:
    # padded length buckets need no inside mask: inside values of valid
    # cells depend only on valid cells
    inside_h, inside_s, inside_c, bp, val = inside_pass(
        cfg, dp, h0, c0=c0, obj=obj, rng=rng, train=train, with_cky=with_cky)
    outside_h = outside_s = outside_c = None
    if outside:
        outside_h, outside_s, outside_c = outside_pass(
            cfg, dp, inside_h, inside_s, inside_c=inside_c, lengths=lengths)
    return InsideOut(inside_h, inside_s, inside_c,
                     outside_h, outside_s, outside_c, bp, val)
