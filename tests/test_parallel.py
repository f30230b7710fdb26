"""Data-parallel training on the virtual 8-device CPU mesh.

Checks the dp-sharded train step (a) compiles and runs, (b) produces
bit-consistent parameters vs. the single-device step for the same batch
(gradient allreduce = mean over the same global batch).
"""

import jax
import numpy as np

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.parallel.mesh import make_mesh, shard_batch
from cliora_tpu.training.checkpoint import flatten
from cliora_tpu.training.trainer import TrainConfig, Trainer

D, E, V = 16, 24, 50


def _batch(rs, B, L):
    return {
        "sentences": rs.randint(2, V, (B, L)),
        "neg_samples": rs.choice(V, 5, replace=False),
    }


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_dp_step_matches_single_device(rng):
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True)
    mesh = make_mesh(8)

    tr_dp = Trainer.build(cfg, tc, V, seed=0, mesh=mesh)
    tr_single = Trainer.build(cfg, tc, V, seed=0)

    batch = _batch(rng, 16, 6)
    rngkey = jax.random.PRNGKey(0)
    for step in range(3):
        m_dp = tr_dp.step(batch, rng=rngkey)
        m_single = tr_single.step(batch, rng=rngkey)
    np.testing.assert_allclose(
        m_dp["total_loss"], m_single["total_loss"], rtol=1e-5)
    f_dp = flatten(tr_dp.params)
    f_single = flatten(tr_single.params)
    for k in f_dp:
        np.testing.assert_allclose(f_dp[k], f_single[k], atol=1e-5,
                                   err_msg=k)


def test_dp_batch_actually_sharded(rng):
    mesh = make_mesh(8)
    batch = shard_batch(mesh, _batch(rng, 16, 6))
    sh = batch["sentences"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("dp", None)
    # neg samples (k=5, not divisible by 8) replicated
    assert batch["neg_samples"].sharding.spec == jax.sharding.PartitionSpec()


def test_shard_batch_indivisible_raises(rng):
    mesh = make_mesh(8)
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(mesh, _batch(rng, 15, 6))
    with pytest.warns(UserWarning, match="not divisible"):
        batch = shard_batch(mesh, _batch(rng, 15, 6), on_indivisible="warn")
    assert batch["sentences"].sharding.spec == jax.sharding.PartitionSpec()


def test_dp_cliora_step_runs(rng):
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=4,
                      obj_feat_size=32)
    tc = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True)
    mesh = make_mesh(8)
    tr = Trainer.build(cfg, tc, V, seed=1, mesh=mesh)
    batch = _batch(rng, 8, 5)
    batch["obj_feats"] = rng.randn(8, 4, 32).astype(np.float32)
    m = tr.step(batch, rng=jax.random.PRNGKey(0))
    assert np.isfinite(m["total_loss"])
