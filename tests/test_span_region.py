"""Fused span x region max: impl parity, custom-VJP correctness, and
trainer-level equivalence of the fused loss path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.ops.span_region import span_region_max

A, C, M, R, D = 3, 5, 17, 7, 24


def _data(rng):
    span = jnp.asarray(rng.randn(A, M, D).astype(np.float32))
    obj = jnp.asarray(rng.randn(C, R, D).astype(np.float32))
    return span, obj


@pytest.mark.parametrize("impl", ["chunked", "pallas"])
def test_impl_parity(impl, rng):
    span, obj = _data(rng)
    want = span_region_max(span, obj, "einsum")
    got = span_region_max(span, obj, impl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("impl", ["einsum", "chunked", "pallas"])
def test_custom_vjp_matches_autodiff(impl, rng):
    span, obj = _data(rng)

    def ref_loss(span, obj):
        s = jnp.einsum("amd,crd->acmr", span, obj)
        return jnp.sum(jnp.tanh(jnp.max(s, -1)))

    def fused_loss(span, obj):
        return jnp.sum(jnp.tanh(span_region_max(span, obj, impl)))

    want = jax.grad(ref_loss, argnums=(0, 1))(span, obj)
    got = jax.grad(fused_loss, argnums=(0, 1))(span, obj)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=1e-5)


def test_pallas_backward_image_blocking(rng, monkeypatch):
    """The dspan kernel blocks over images (DSPAN_CBLK) so VMEM stays
    bounded at large batch; force multi-block (with C-padding) on the
    tiny test shape and check grads against the einsum oracle."""
    import cliora_tpu.ops.span_region as sr

    monkeypatch.setattr(sr, "DSPAN_CBLK", 2)   # C=5 -> pad 6, 3 blocks
    span, obj = _data(rng)

    def ref_loss(span, obj):
        s = jnp.einsum("amd,crd->acmr", span, obj)
        return jnp.sum(jnp.tanh(jnp.max(s, -1)))

    def fused_loss(span, obj):
        return jnp.sum(jnp.tanh(span_region_max(span, obj, "pallas")))

    want = jax.grad(ref_loss, argnums=(0, 1))(span, obj)
    got = jax.grad(fused_loss, argnums=(0, 1))(span, obj)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=1e-5)


def test_trainer_fused_path_matches_einsum(rng):
    """Full CLIORA train step: fused attn_impl == einsum attn_impl."""
    import dataclasses
    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.training.checkpoint import flatten
    from cliora_tpu.training.trainer import TrainConfig

    cfg = ModelConfig(size=16, input_size=24, use_obj=True, n_regions=4,
                      obj_feat_size=32, attn_dropout=0.0)
    base = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True)
    batch = {
        "sentences": rng.randint(2, 50, (4, 5)),
        "neg_samples": rng.choice(50, 5, replace=False),
        "obj_feats": rng.randn(4, 4, 32).astype(np.float32),
    }
    # Perturb the (zero-init) image encoder: with all-zero region
    # embeddings every region score ties at 0, and jax's max-VJP splits
    # ties evenly while the fused path routes to the argmax (= torch's
    # semantics, cliora/net/trainer.py:103); off the tied state the
    # gradients agree.
    from cliora_tpu.models.params import init_params

    params0 = init_params(jax.random.PRNGKey(4), cfg, 50)
    key = jax.random.PRNGKey(9)
    params0["img_encoder"] = jax.tree.map(
        lambda x: 0.01 * jax.random.normal(key, x.shape),
        params0["img_encoder"])

    from cliora_tpu.training.trainer import compute_losses

    tokens = jnp.asarray(batch["sentences"])
    neg = jnp.asarray(batch["neg_samples"])
    obj = jnp.asarray(batch["obj_feats"])

    results = {}
    for impl in ("einsum", "chunked", "pallas"):
        tc = dataclasses.replace(base, attn_impl=impl)

        def loss_fn(p):
            return compute_losses(cfg, tc, p, tokens, neg, obj_feats=obj,
                                  rng=jax.random.PRNGKey(0), train=True)

        (total, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p), has_aux=True)(params0)
        results[impl] = ({k: float(v) for k, v in metrics.items()},
                         flatten(grads))
    for impl in ("chunked", "pallas"):
        for k, v in results["einsum"][0].items():
            np.testing.assert_allclose(results[impl][0][k], v, rtol=1e-4,
                                       err_msg=f"{impl}:{k}")
        for k, v in results["einsum"][1].items():
            np.testing.assert_allclose(results[impl][1][k], v, atol=1e-5,
                                       err_msg=f"{impl}:grad:{k}")
