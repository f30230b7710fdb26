"""bf16 compute-path validation: the --bf16 flag (ModelConfig
compute_dtype='bfloat16') runs the chart matmuls (compose MLP, bilinear
scorer, region attention) in bfloat16 with f32 accumulation -- the v5e
MXU's native fast path.  These tests pin that the numerics stay usable:
charts close to f32, losses overlapping, training descending.

(reference has no mixed-precision path; this is a TPU-native extension,
validated against our own f32 path which is gold-parity tested in
tests/test_reference_parity.py)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_params
from cliora_tpu.training.trainer import TrainConfig, Trainer, compute_losses

D, E, V, R, F = 48, 32, 80, 4, 24


@pytest.fixture(scope="module")
def pair():
    cfg32 = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=R,
                        obj_feat_size=F, attn_dropout=0.0)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg32, V)
    from oracle import perturb_params

    return cfg32, cfg16, perturb_params(params, scale=0.05)


def test_bf16_charts_close_to_f32(pair, rng):
    from cliora_tpu.models.diora import (
        diora_forward,
        embed_forward,
        image_encoder_forward,
    )

    cfg32, cfg16, params = pair
    toks = jnp.asarray(rng.randint(2, V, (4, 8)))
    feats = jnp.asarray(rng.randn(4, R, F).astype(np.float32))

    def fwd(cfg):
        xs, xw = embed_forward(params["embed"], toks)
        os_, ow = image_encoder_forward(params["img_encoder"], feats)
        return diora_forward(cfg, params, xs, xw, obj_span=os_, obj_word=ow,
                             train=False, with_cky=True)

    o32, o16 = fwd(cfg32), fwd(cfg16)
    # h vectors are unit-normed; bf16 (8 mantissa bits) perturbs each
    # matmul by ~4e-3 relative, compounded over <=8 levels
    np.testing.assert_allclose(np.asarray(o16.chart.inside_h),
                               np.asarray(o32.chart.inside_h), atol=0.05)
    np.testing.assert_allclose(np.asarray(o16.chart.outside_h),
                               np.asarray(o32.chart.outside_h), atol=0.08)
    # accumulated scores grow with level; compare with mixed tolerance
    np.testing.assert_allclose(np.asarray(o16.chart.inside_s),
                               np.asarray(o32.chart.inside_s),
                               rtol=0.05, atol=0.05)


def test_bf16_losses_match_f32(pair, rng):
    cfg32, cfg16, params = pair
    toks = jnp.asarray(rng.randint(2, V, (4, 7)))
    feats = jnp.asarray(rng.randn(4, R, F).astype(np.float32))
    neg = jnp.asarray(rng.choice(V, 9, replace=False))
    tc = TrainConfig(lr=1e-3, k_neg=9, vg_loss=True, use_contr=True)

    def losses(cfg):
        _, m = compute_losses(cfg, tc, params, toks, neg, obj_feats=feats,
                              rng=None, train=True)
        return {k: float(v) for k, v in m.items()}

    m32, m16 = losses(cfg32), losses(cfg16)
    for k in m32:
        # 3% relative: the hinge-sum contrastive loss is O(100) on this
        # perturbation draw and legitimately moves ~2% under bf16 charts
        assert abs(m16[k] - m32[k]) <= 0.02 + 0.03 * abs(m32[k]), \
            (k, m16[k], m32[k])


def test_bf16_training_descends_like_f32(pair, rng):
    """Overfit one batch: the bf16 loss curve tracks the f32 curve."""
    cfg32, cfg16, _ = pair
    tc = TrainConfig(lr=2e-3, k_neg=9, emb_trainable=True)
    batch = {
        "sentences": rng.randint(2, V, (8, 7)),
        "neg_samples": rng.choice(V, 9, replace=False),
    }

    def curve(cfg):
        tr = Trainer.build(
            dataclasses.replace(cfg, use_obj=False), tc, V, seed=3)
        out = []
        for step in range(25):
            m = tr.step(batch, rng=jax.random.PRNGKey(step))
            out.append(float(m["total_loss"]))
        return np.asarray(out)

    c32, c16 = curve(cfg32), curve(cfg16)
    assert c16[-1] < 0.55 * c16[0], c16          # bf16 learns
    # curves overlap: same descent within 10% of the f32 loss scale
    np.testing.assert_allclose(c16, c32, rtol=0.1, atol=0.1 * c32[0])


def test_bf16_grads_finite_and_aligned(pair, rng):
    cfg32, cfg16, params = pair
    toks = jnp.asarray(rng.randint(2, V, (4, 6)))
    feats = jnp.asarray(rng.randn(4, R, F).astype(np.float32))
    neg = jnp.asarray(rng.choice(V, 9, replace=False))
    tc = TrainConfig(lr=1e-3, k_neg=9, vg_loss=True, use_contr=True)

    def total(cfg, p):
        t, _ = compute_losses(cfg, tc, p, toks, neg, obj_feats=feats,
                              rng=None, train=True)
        return t

    g32 = jax.grad(lambda p: total(cfg32, p))(params)
    g16 = jax.grad(lambda p: total(cfg16, p))(params)
    f32_, _ = jax.tree_util.tree_flatten(g32)
    f16_, _ = jax.tree_util.tree_flatten(g16)
    for a, b in zip(f32_, f16_):
        assert np.all(np.isfinite(np.asarray(b)))
        # direction agreement: cosine similarity of nontrivial grads
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-6 and nb > 1e-6:
            cos = float(np.vdot(a, b) / (na * nb))
            assert cos > 0.98, cos
