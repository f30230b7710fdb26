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


def reconstruction_loss(recon_params, embed_table, tokens, neg_samples,
                        outside_h):
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
    loss = jnp.mean(jax.nn.logsumexp(score, axis=-1) - score[..., 0])
    return loss


def vg_loss_from_scores(phrase_region_max, alpha_vg: float = 1.0):
    """As :func:`vg_loss` but from pre-reduced (B, B, L) best-region
    scores (see ops/span_region.py for the fused reduction)."""
    B, _, L = phrase_region_max.shape
    logits = jnp.sum(phrase_region_max, axis=-1) / L
    logZ = jax.nn.logsumexp(logits, axis=1)
    loss = jnp.mean(logZ - jnp.diagonal(logits))
    return alpha_vg * loss


def vg_loss(vg_atten_score, alpha_vg: float = 1.0):
    """Word-level visual-grounding InfoNCE across the batch.

    (reference: cliora/net/trainer.py:131-171; its "V1" variant)

    Args:
      vg_atten_score: (B, B, L, R) word x region scores for every
        (sentence, image) pair in the batch.
    """
    B = vg_atten_score.shape[0]
    L = vg_atten_score.shape[2]
    phrase_region_max = jnp.max(vg_atten_score, axis=-1)   # (B, B, L)
    logits = jnp.sum(phrase_region_max, axis=-1) / L        # (B, B)
    logZ = jax.nn.logsumexp(logits, axis=1)
    loss = jnp.mean(logZ - jnp.diagonal(logits))
    return alpha_vg * loss


def contrastive_loss_from_scores(inside_s, outside_s, scores,
                                 margin: float = 0.2,
                                 alpha_contr: float = 1.0):
    """As :func:`contrastive_loss` but from pre-reduced (B, B, ncells)
    best-region scores (see ops/span_region.py)."""
    ins = inside_s[..., 0]
    outs = outside_s[..., 0]
    B, NC = ins.shape

    scores = jnp.transpose(scores, (2, 0, 1))    # (NC, B_t, B_i)
    diag = jnp.diagonal(scores, axis1=-2, axis2=-1)
    d1 = diag[:, :, None]
    d2 = diag[:, None, :]

    eye = jnp.eye(B, dtype=bool)[None]
    loss_txt = jnp.maximum(margin + scores - d1, MIN_VAL)
    loss_img = jnp.maximum(margin + scores - d2, MIN_VAL)
    loss_txt = jnp.where(eye, 0.0, loss_txt).mean(axis=2)
    loss_img = jnp.where(eye, 0.0, loss_img).mean(axis=1)
    vl_loss = (loss_txt + loss_img).T

    span_margs = jnp.exp(ins + outs - ins[:, -1:])
    loss_mat = span_margs * vl_loss
    loss = jnp.mean(jnp.sum(loss_mat[:, : NC // 2], axis=-1))
    return alpha_contr * loss


def contrastive_loss(inside_s, outside_s, all_atten_score,
                     margin: float = 0.2, alpha_contr: float = 1.0):
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
    """
    ins = inside_s[..., 0]                       # (B, ncells)
    outs = outside_s[..., 0]
    B, NC = ins.shape

    scores = jnp.max(all_atten_score, axis=-1)   # (B_t, B_i, NC)
    scores = jnp.transpose(scores, (2, 0, 1))    # (NC, B_t, B_i)
    diag = jnp.diagonal(scores, axis1=-2, axis2=-1)  # (NC, B)
    d1 = diag[:, :, None]                        # own-image score per text
    d2 = diag[:, None, :]                        # own-text score per image

    eye = jnp.eye(B, dtype=bool)[None]
    loss_txt = jnp.maximum(margin + scores - d1, MIN_VAL)
    loss_img = jnp.maximum(margin + scores - d2, MIN_VAL)
    loss_txt = jnp.where(eye, 0.0, loss_txt).mean(axis=2)   # (NC, B_t)
    loss_img = jnp.where(eye, 0.0, loss_img).mean(axis=1)   # (NC, B_i)
    vl_loss = (loss_txt + loss_img).T            # (B, NC)

    span_margs = jnp.exp(ins + outs - ins[:, -1:])          # (B, NC)
    loss_mat = span_margs * vl_loss
    loss = jnp.mean(jnp.sum(loss_mat[:, : NC // 2], axis=-1))
    return alpha_contr * loss
