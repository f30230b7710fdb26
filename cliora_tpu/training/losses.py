"""Training losses: reconstruction, word-level visual grounding (InfoNCE),
and span-level contrastive grounding.

All pure functions over the forward outputs; loss params live in the main
parameter tree (``params['reconstruct']``).
(reference: cliora/net/trainer.py:25-201)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_VAL = 1e-8


def word_mask(lengths, L):
    """(B, L) bool: position < true sentence length."""
    return jnp.arange(L, dtype=jnp.int32)[None] < lengths[:, None]


def valid_cell_mask(n: int, lengths):
    """(B, ncells(n)) bool: the cell's span lies inside ``[0, m)``, i.e.
    the chart value at this cell is meaningful for an example of true
    length ``m`` (pad cells hold garbage in padded length buckets)."""
    from cliora_tpu.chart.offsets import cell_coords

    lev_np, pos_np = cell_coords(n)
    lev = jnp.asarray(lev_np, jnp.int32)[None]     # (1, NC)
    pos = jnp.asarray(pos_np, jnp.int32)[None]
    return pos + lev + 1 <= lengths[:, None]


def contrastive_cell_mask(n: int, lengths):
    """(B, ncells(n)) bool: cells of the padded chart that the reference's
    half-chart contrastive slice would cover at each true length ``m``.

    The reference sums over the first ``ncells(m)//2`` cells of the exact
    length-``m`` chart (cliora/net/trainer.py:125 ``[:span_length//2]``);
    in the padded layout that is: cell valid (``pos+level+1 <= m``) and its
    *true-chart* level-major rank ``level*m - level(level-1)/2 + pos``
    below ``(m(m+1)/2)//2``.
    """
    from cliora_tpu.chart.offsets import cell_coords

    lev_np, pos_np = cell_coords(n)
    lev = jnp.asarray(lev_np, jnp.int32)[None]     # (1, NC)
    pos = jnp.asarray(pos_np, jnp.int32)[None]
    m = lengths[:, None]                           # (B, 1)
    valid = pos + lev + 1 <= m
    rank = lev * m - lev * (lev - 1) // 2 + pos
    half = (m * (m + 1) // 2) // 2
    return valid & (rank < half)


def root_cell_index(n: int, lengths):
    """(B,) flat index of the true root cell (level ``m-1``, pos 0)."""
    from cliora_tpu.chart.offsets import level_offsets

    return jnp.asarray(level_offsets(n), jnp.int32)[lengths - 1]


def reconstruction_loss(recon_params, embed_table, tokens, neg_samples,
                        outside_h, lengths=None):
    """Masked-word reconstruction with sampled-softmax CE.

    Each leaf's *outside* vector must prefer the true word over ``k``
    corpus-sampled negatives (negatives shared batch-wide).
    (reference: cliora/net/trainer.py:46-78)

    Args:
      recon_params: {'mat': (D, E)} projection.
      embed_table: (V, E) word embedding matrix.
      tokens: (B, L) int ids.
      neg_samples: (k,) int ids, distinct, one draw per batch.
      outside_h: (B, ncells, D) outside chart; leaves are cells [0, L).
      lengths: (B,) true lengths for padded buckets; pad positions are
        excluded from the mean.
    """
    B, L = tokens.shape
    mat = recon_params["mat"]
    cell = outside_h[:, :L]                        # (B, L, D)
    emb_pos = jnp.take(embed_table, tokens, axis=0)       # (B, L, E)
    emb_neg = jnp.take(embed_table, neg_samples, axis=0)  # (k, E)
    proj_pos = emb_pos @ mat.T                     # (B, L, D)
    proj_neg = emb_neg @ mat.T                     # (k, D)

    xp = jnp.einsum("bld,bld->bl", proj_pos, cell)[..., None]  # (B, L, 1)
    xn = jnp.einsum("kd,bld->blk", proj_neg, cell)             # (B, L, k)
    score = jnp.concatenate([xp, xn], axis=-1)     # (B, L, 1+k)
    # cross-entropy with target index 0
    per_word = jax.nn.logsumexp(score, axis=-1) - score[..., 0]   # (B, L)
    if lengths is None:
        return jnp.mean(per_word)
    mask = word_mask(lengths, L)
    return jnp.sum(per_word * mask) / jnp.sum(mask)


def _vg_logits(phrase_region_max, lengths):
    """(B, B) mean-over-words logits; word axis masked by the *text*
    example's true length when padded."""
    B, _, L = phrase_region_max.shape
    if lengths is None:
        return jnp.sum(phrase_region_max, axis=-1) / L
    mask = word_mask(lengths, L)[:, None, :]       # (B_text, 1, L)
    return (jnp.sum(phrase_region_max * mask, axis=-1)
            / lengths[:, None].astype(jnp.float32))


def vg_loss_from_scores(phrase_region_max, alpha_vg: float = 1.0,
                        lengths=None):
    """As :func:`vg_loss` but from pre-reduced (B, B, L) best-region
    scores (see ops/span_region.py for the fused reduction)."""
    logits = _vg_logits(phrase_region_max, lengths)
    logZ = jax.nn.logsumexp(logits, axis=1)
    loss = jnp.mean(logZ - jnp.diagonal(logits))
    return alpha_vg * loss


def vg_loss(vg_atten_score, alpha_vg: float = 1.0, lengths=None):
    """Word-level visual-grounding InfoNCE across the batch.

    (reference: cliora/net/trainer.py:131-171; its "V1" variant)

    Args:
      vg_atten_score: (B, B, L, R) word x region scores for every
        (sentence, image) pair in the batch.
      lengths: (B,) true lengths; pad words excluded from each text's
        mean-over-words logit.
    """
    phrase_region_max = jnp.max(vg_atten_score, axis=-1)   # (B, B, L)
    logits = _vg_logits(phrase_region_max, lengths)         # (B, B)
    logZ = jax.nn.logsumexp(logits, axis=1)
    loss = jnp.mean(logZ - jnp.diagonal(logits))
    return alpha_vg * loss


def _contrastive_from_cell_scores(ins, outs, scores, margin, alpha_contr,
                                  lengths):
    """Shared tail of the contrastive variants.

    ``scores``: (B_t, B_i, NC) best-region score per (text, image, cell).
    """
    B, NC = ins.shape
    scores = jnp.transpose(scores, (2, 0, 1))    # (NC, B_t, B_i)
    diag = jnp.diagonal(scores, axis1=-2, axis2=-1)  # (NC, B)
    d1 = diag[:, :, None]                        # own-image score per text
    d2 = diag[:, None, :]                        # own-text score per image

    eye = jnp.eye(B, dtype=bool)[None]
    drop_txt = drop_img = eye
    mask = None
    if lengths is not None:
        # a (cell, text) pair whose cell is a pad cell for *that text*
        # holds a garbage span score: exclude it from BOTH hinge
        # directions (loss_img averages over texts, so the text-side
        # marginal weighting alone would not keep other examples' pad
        # cells out).  For uniform-length batches no valid term is
        # dropped and denominators stay B -- exact parity with the
        # unbucketed case (pinned by tests/test_bucketing.py).
        n = int(round(((8 * NC + 1) ** 0.5 - 1) / 2))
        mask = contrastive_cell_mask(n, lengths)            # (B, NC)
        invalid_t = ~jnp.transpose(
            valid_cell_mask(n, lengths))[:, :, None]        # (NC, B_t, 1)
        drop_txt = eye | invalid_t
        drop_img = eye | invalid_t
    loss_txt = jnp.maximum(margin + scores - d1, MIN_VAL)
    loss_img = jnp.maximum(margin + scores - d2, MIN_VAL)
    loss_txt = jnp.where(drop_txt, 0.0, loss_txt).mean(axis=2)  # (NC, B_t)
    loss_img = jnp.where(drop_img, 0.0, loss_img).mean(axis=1)  # (NC, B_i)
    vl_loss = (loss_txt + loss_img).T            # (B, NC)

    if lengths is None:
        span_margs = jnp.exp(ins + outs - ins[:, -1:])      # (B, NC)
        loss_mat = span_margs * vl_loss
        loss = jnp.mean(jnp.sum(loss_mat[:, : NC // 2], axis=-1))
        return alpha_contr * loss

    # padded buckets: marginals renormalize against the true root, and
    # the half-chart slice becomes a per-example cell mask.  The exponent
    # is masked BEFORE exp so garbage pad-cell scores can't overflow.
    root_s = jnp.take_along_axis(
        ins, root_cell_index(n, lengths)[:, None], axis=1)  # (B, 1)
    span_margs = jnp.exp(jnp.where(mask, ins + outs - root_s, 0.0)) * mask
    loss = jnp.mean(jnp.sum(span_margs * vl_loss, axis=-1))
    return alpha_contr * loss


def contrastive_loss_from_scores(inside_s, outside_s, scores,
                                 margin: float = 0.2,
                                 alpha_contr: float = 1.0,
                                 lengths=None):
    """As :func:`contrastive_loss` but from pre-reduced (B, B, ncells)
    best-region scores (see ops/span_region.py)."""
    return _contrastive_from_cell_scores(
        inside_s[..., 0], outside_s[..., 0], scores, margin, alpha_contr,
        lengths)


def contrastive_loss(inside_s, outside_s, all_atten_score,
                     margin: float = 0.2, alpha_contr: float = 1.0,
                     lengths=None):
    """Span-level contrastive grounding, weighted by span marginals.

    Hinge on best-region scores vs. the matched (diagonal) pair in both
    text->image and image->text directions; each span's hinge is weighted
    by exp(inside_s + outside_s - root_s) and only the first half of the
    chart cells (the shorter spans) contribute.
    (reference: cliora/net/trainer.py:81-128.  Parity notes: the "hinge"
    clamps at MIN_VAL=1e-8, not 0, and the diagonal is zeroed *after*
    clamping.)

    Args:
      inside_s / outside_s: (B, ncells, 1) chart score channels.
      all_atten_score: (B_text, B_img, ncells, R).
      lengths: (B,) true lengths for padded buckets (see
        :func:`contrastive_cell_mask`).
    """
    scores = jnp.max(all_atten_score, axis=-1)   # (B_t, B_i, NC)
    return _contrastive_from_cell_scores(
        inside_s[..., 0], outside_s[..., 0], scores, margin, alpha_contr,
        lengths)
