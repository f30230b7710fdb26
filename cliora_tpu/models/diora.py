"""DIORA / CLIORA forward passes as pure functions.

One code path serves both: ``cfg.use_obj`` selects the CLIORA variant
(visual residuals at the leaves and every inside level, plus the
span x region / word x region attention scores).
(reference: cliora/net/diora.py:205-471, cliora/net/cliora.py:213-488)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.ops.chart_pass import InsideOut, run_chart
from cliora_tpu.ops.core import (
    leaf_mlp,
    linear,
    normalize,
    region_attention,
)


class DioraOutput(NamedTuple):
    chart: InsideOut
    # CLIORA attention scores (None for text-only DIORA):
    all_atten_score: Optional[jax.Array]   # (B, B, ncells, R)
    vg_atten_score: Optional[jax.Array]    # (B, B, L, R)
    atten_score: Optional[jax.Array]       # (B, L, R) per-example diagonal


def embed_forward(ep, token_ids, trainable: bool = True):
    """Token ids -> (emb_span, emb_word).

    (reference: cliora/net/trainer.py:219-224 ``Embed.forward``)
    """
    table = ep["embeddings"]
    if not trainable:
        table = jax.lax.stop_gradient(table)
    emb = jnp.take(table, token_ids, axis=0)          # (B, L, E)
    emb_span = emb @ ep["mat"].T                       # (B, L, D)
    emb_word = emb @ ep["mat1"].T
    return emb_span, emb_word


def image_encoder_forward(ip, obj_feats):
    """Region features -> (span-branch, word-branch) embeddings.

    (reference: cliora/net/utils.py:52-55)
    """
    obj_feats = obj_feats.astype(jnp.float32)
    return linear(ip["fc"], obj_feats), linear(ip["fc_vis"], obj_feats)


def leaf_transform(cfg: ModelConfig, dp, x_span, obj_span=None, rng=None,
                   train: bool = False):
    """Leaf vectors for the inside chart.

    DIORA:  h = norm(tanh(leaf_fc(x)))  (diora.py:58-63,283-292)
    CLIORA: h = norm(norm(tanh(leaf_fc(x))) + attend(., obj))
            (cliora.py:71-80,290-301)
    Returns (h, c); c is None for the MLP arch.
    """
    cp = dp["inside_compose"]
    h = leaf_mlp(cp, x_span)
    if cfg.use_obj:
        h = normalize(cfg.normalize, h)
        lrng = jax.random.fold_in(rng, 0) if rng is not None else None
        cxt = region_attention(
            h, obj_span, temp=cfg.attn_temp,
            dropout=cfg.attn_dropout, rng=lrng, train=train)
        h = h + cxt
    h = normalize(cfg.normalize, h)
    c = None
    if cfg.arch == "treelstm":
        c = normalize(cfg.normalize, jnp.tanh(linear(cp["leaf_fc_c"], x_span)))
    return h, c


def diora_forward(
    cfg: ModelConfig,
    params,
    x_span,
    x_word=None,
    obj_span=None,
    obj_word=None,
    rng=None,
    train: bool = True,
    with_cky: bool = False,
    outside: Optional[bool] = None,
    with_all_atten: bool = True,
    materialize_atten: bool = True,
    lengths=None,
) -> DioraOutput:
    """Run the full inside-outside recursion (+ CLIORA attention scores).

    Args:
      x_span / x_word: (B, L, D) projected word embeddings (span / word
        branches of ``Embed``).
      obj_span / obj_word: (B, R, D) projected region features.
      outside: override cfg.outside (the reference toggles it at eval,
        scripts/train.py:130).
      with_all_atten: materialize the B^2 span x region score (needed for
        the contrastive loss and eval; skippable for cheap fwd).
      lengths: (B,) true sentence lengths for padded length buckets
        (None = every sentence fills the chart).
    """
    dp = params["diora"]
    run_outside = cfg.outside if outside is None else outside

    h0, c0 = leaf_transform(cfg, dp, x_span, obj_span=obj_span, rng=rng,
                            train=train)
    chart = run_chart(
        cfg, dp, h0, c0=c0, obj=obj_span, rng=rng, train=train,
        with_cky=with_cky, outside=run_outside, lengths=lengths)

    all_atten = vg_atten = atten = None
    if cfg.use_obj and train and not materialize_atten:
        # the fused-score loss path (ops/span_region.py) computes its
        # reductions directly from the chart; skip the B^2 tensors
        return DioraOutput(chart, None, None, None)
    if cfg.use_obj:
        B, L = x_span.shape[0], x_span.shape[1]
        ih = chart.inside_h
        span_vec = ih + chart.outside_h if run_outside else ih
        if with_all_atten:
            # (reference: cliora/net/cliora.py:457 -- every chart cell of
            # every sentence scored against every image's regions)
            all_atten = jnp.einsum("and,crd->acnr", span_vec, obj_span)
        if train:
            # (cliora.py:459-461)
            vg_atten = jnp.einsum("ald,crd->aclr", x_word, obj_word)
        else:
            # (cliora.py:462-464)
            vg_word = jnp.einsum(
                "ald,crd->aclr", normalize(cfg.normalize, x_word), obj_word)
            if with_all_atten:
                vg_atten = all_atten[:, :, :L] + vg_word
            else:
                word_span = jnp.einsum(
                    "ald,ard->alr", span_vec[:, :L], obj_span)
                vg_atten = vg_word.at[
                    jnp.arange(B), jnp.arange(B)].add(word_span)
        # per-example diagonal (cliora.py:466)
        atten = vg_atten[jnp.arange(B), jnp.arange(B)]
    return DioraOutput(chart, all_atten, vg_atten, atten)
