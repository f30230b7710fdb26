"""Fused inside+CKY Pallas kernel vs. the XLA flat path (interpret mode
on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_diora_params
from cliora_tpu.ops.chart_pass import run_chart
from cliora_tpu.ops.core import unit_norm
from cliora_tpu.ops.pallas_chart import BB, fused_inside_cky_pallas

D = 16


@pytest.mark.parametrize("n", [3, 7, 12])
def test_fused_inside_cky_matches_flat(n, rng):
    cfg = ModelConfig(size=D)
    dp = init_diora_params(jax.random.PRNGKey(2), cfg)
    B = BB
    x = rng.randn(B, n, D).astype(np.float32)
    h0 = unit_norm(jnp.tanh(
        x @ dp["inside_compose"]["leaf_fc"]["w"].T
        + dp["inside_compose"]["leaf_fc"]["b"]))

    want = run_chart(cfg, dp, h0, with_cky=True, outside=False)
    got_s, got_bp, got_val = fused_inside_cky_pallas(dp, h0)

    np.testing.assert_allclose(np.asarray(got_s),
                               np.asarray(want.inside_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_val),
                               np.asarray(want.cky_val), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_bp),
                                  np.asarray(want.cky_bp))


def test_fused_multiblock(rng):
    """Several grid programs (B > BB): per-block isolation."""
    n = 5
    cfg = ModelConfig(size=D)
    dp = init_diora_params(jax.random.PRNGKey(3), cfg)
    B = 3 * BB
    x = rng.randn(B, n, D).astype(np.float32)
    h0 = unit_norm(jnp.tanh(
        x @ dp["inside_compose"]["leaf_fc"]["w"].T
        + dp["inside_compose"]["leaf_fc"]["b"]))
    want = run_chart(cfg, dp, h0, with_cky=True, outside=False)
    _, got_bp, got_val = fused_inside_cky_pallas(dp, h0)
    np.testing.assert_array_equal(np.asarray(got_bp),
                                  np.asarray(want.cky_bp))
    np.testing.assert_allclose(np.asarray(got_val),
                               np.asarray(want.cky_val), atol=1e-4)


def test_trainer_parse_pallas_impl(rng):
    """parse(impl='pallas') routes through the fused kernel and agrees
    with the default XLA decode."""
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    cfg = ModelConfig(size=D)
    tc = TrainConfig(lr=1e-3, k_neg=5)
    tr = Trainer.build(cfg, tc, 40, seed=0)
    batch = {"sentences": rng.randint(2, 40, (BB, 6)),
             "neg_samples": rng.choice(40, 5, replace=False)}
    res_x, _ = tr.parse(batch, outside=False)
    res_p, _ = tr.parse(batch, impl="pallas")
    np.testing.assert_array_equal(res_p["cky_bp"], res_x["cky_bp"])
    # published trees are attributable to their decode backend
    assert res_x["parse_impl"] == "xla"
    assert res_p["parse_impl"] == "pallas"
