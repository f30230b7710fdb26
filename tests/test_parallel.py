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


def test_tp_step_matches_single_device(rng):
    """(dp=2, mp=4) tensor-parallel text step vs single device.

    Megatron-style sharded matmuls re-associate the contraction psums,
    so equality is allclose (not bitwise like pure dp).  Text-only, like
    the dp parity test above: CLIORA's zero-init image encoder receives
    roundoff-scale gradients early on, which Adam normalizes up to
    lr-scale updates -- any cross-sharding reduction-order noise is then
    amplified to O(lr), so those params carry no parity contract (the
    CLIORA tp step is covered by test_tp_cliora_step_runs)."""
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True)
    mesh = make_mesh(8, mp=4)
    assert mesh.devices.shape == (2, 4)

    tr_tp = Trainer.build(cfg, tc, V, seed=0, mesh=mesh)
    tr_single = Trainer.build(cfg, tc, V, seed=0)

    batch = _batch(rng, 8, 6)
    rngkey = jax.random.PRNGKey(0)
    for step in range(3):
        m_tp = tr_tp.step(batch, rng=rngkey)
        m_single = tr_single.step(batch, rng=rngkey)
    np.testing.assert_allclose(
        m_tp["total_loss"], m_single["total_loss"], rtol=1e-5)
    f_tp = flatten(tr_tp.local_params())
    f_single = flatten(tr_single.params)
    for k in f_tp:
        np.testing.assert_allclose(np.asarray(f_tp[k]), f_single[k],
                                   atol=1e-5, err_msg=k)


def test_tp_cliora_step_runs(rng):
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=4,
                      obj_feat_size=32)
    tc = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True,
                     emb_trainable=True)
    tr = Trainer.build(cfg, tc, V, seed=0, mesh=make_mesh(8, mp=4))
    batch = _batch(rng, 8, 6)
    batch["obj_feats"] = rng.randn(8, 4, 32).astype(np.float32)
    m0 = tr.step(batch, rng=jax.random.PRNGKey(0))
    m1 = tr.step(batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(m0["total_loss"]) and np.isfinite(m1["total_loss"])
    assert m1["total_loss"] < m0["total_loss"]  # same batch: loss descends


def test_tp_params_actually_sharded():
    from jax.sharding import PartitionSpec as P

    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5)
    tr = Trainer.build(cfg, tc, V, seed=0, mesh=make_mesh(8, mp=4))
    dp_ = tr.params["diora"]
    assert dp_["inside_compose"]["fc0"]["w"].sharding.spec == P("mp", None)
    assert dp_["inside_compose"]["fc0"]["b"].sharding.spec == P("mp")
    assert dp_["inside_compose"]["fc1"]["w"].sharding.spec == P(None, "mp")
    assert dp_["inside_score"]["mat"].sharding.spec == P(None, "mp")
    assert tr.params["embed"]["embeddings"].sharding.spec == P(None, "mp")
    assert tr.params["reconstruct"]["mat"].sharding.spec == P(None, "mp")
    # row-parallel bias + root vector stay replicated
    assert dp_["inside_compose"]["fc1"]["b"].sharding.spec == P()
    assert dp_["root_vector_out_h"].sharding.spec == P()
    # Adam mu inherited the param shardings through the jitted init
    mu = tr.state.opt_state[1].inner_state[0].mu
    assert (mu["diora"]["inside_compose"]["fc0"]["w"].sharding.spec
            == P("mp", None))


def test_tp_indivisible_dim_falls_back_replicated(rng):
    import pytest

    cfg = ModelConfig(size=12, input_size=E)   # 12 % 8 != 0
    tc = TrainConfig(lr=1e-3, k_neg=5)
    with pytest.warns(UserWarning, match="not divisible"):
        tr = Trainer.build(cfg, tc, V, seed=0, mesh=make_mesh(8, mp=8))
    from jax.sharding import PartitionSpec as P
    assert (tr.params["diora"]["inside_compose"]["fc0"]["w"]
            .sharding.spec == P())
    m = tr.step(_batch(rng, 8, 5), rng=jax.random.PRNGKey(0))
    assert np.isfinite(m["total_loss"])


def test_tp_install_state_preserves_sharding(rng):
    """Checkpoint load/resume must re-apply the Megatron shardings, not
    replicate (the load paths previously replicate_tree'd everything)."""
    from jax.sharding import PartitionSpec as P

    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5)
    tr = Trainer.build(cfg, tc, V, seed=0, mesh=make_mesh(8, mp=4))
    host_params = jax.tree.map(np.asarray, flatten(tr.local_params()))
    from cliora_tpu.training.checkpoint import unflatten_like
    loaded, missing, _ = unflatten_like(tr.local_params(), host_params)
    assert not missing
    tr.install_state(loaded)
    assert (tr.params["diora"]["inside_compose"]["fc0"]["w"]
            .sharding.spec == P("mp", None))
    mu = tr.state.opt_state[1].inner_state[0].mu
    assert (mu["diora"]["inside_compose"]["fc0"]["w"].sharding.spec
            == P("mp", None))
    m = tr.step(_batch(rng, 8, 5), rng=jax.random.PRNGKey(0))
    assert np.isfinite(m["total_loss"])


def test_tp_parse_and_eval(rng):
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5)
    mesh = make_mesh(8, mp=4)
    tr = Trainer.build(cfg, tc, V, seed=0, mesh=mesh)
    tr_single = Trainer.build(cfg, tc, V, seed=0)
    batch = _batch(rng, 8, 6)
    res, _ = tr.parse(batch)            # mp forces the xla decode path
    res_s, _ = tr_single.parse(batch, impl="xla")
    np.testing.assert_array_equal(res["cky_bp"], res_s["cky_bp"])


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


def test_step_output_placement_is_stable(rng):
    """The jitted step's out_shardings are pinned to the init placement:
    without this GSPMD drifts output shardings after step 1 (replicated
    leaves observed upgraded to P('mp')), costing a hidden recompile per
    shape and making checkpoint-restored trajectories diverge from
    uninterrupted ones at reduction-order level (round-3 finding)."""
    from cliora_tpu.models.config import ModelConfig as MC
    from cliora_tpu.training.trainer import TrainConfig as TC, Trainer as T

    for mp in (1, 2):
        mesh = make_mesh(8, mp=mp)
        tr = T.build(MC(size=D, input_size=E),
                     TC(lr=1e-3, k_neg=5, emb_trainable=True), V,
                     seed=0, mesh=mesh)
        init_sh = [x.sharding for x in jax.tree.leaves(tr.state)]
        for step in range(2):
            tr.step(_batch(rng, 16, 6), rng=jax.random.PRNGKey(step))
        for s0, leaf in zip(init_sh, jax.tree.leaves(tr.state)):
            assert s0.is_equivalent_to(leaf.sharding, leaf.ndim), \
                (mp, s0, leaf.sharding)


def test_zero1_matches_replicated_opt_state(rng):
    """ZeRO-1 shards Adam mu/nu over dp; the update is elementwise per
    shard so trajectories must match the replicated-opt-state dp run."""
    cfg = ModelConfig(size=D, input_size=E)
    mesh = make_mesh(8)
    tr_z = Trainer.build(cfg, TrainConfig(lr=1e-3, k_neg=5,
                                          emb_trainable=True, zero1=True),
                         V, seed=0, mesh=mesh)
    tr_r = Trainer.build(cfg, TrainConfig(lr=1e-3, k_neg=5,
                                          emb_trainable=True),
                         V, seed=0, mesh=mesh)

    # e.g. the (V=50, E=24) embedding mu/nu shards dim 1 (50 % 8 != 0,
    # 24 % 8 == 0); compose fc0 (2D=32, ...) shards dim 0.  Check at
    # least one params-shaped opt leaf is actually dp-sharded.
    mu_leaves = [x for x in jax.tree.leaves(tr_z.state.opt_state)
                 if hasattr(x, "sharding") and x.ndim >= 1]
    assert any(not x.sharding.is_fully_replicated for x in mu_leaves), \
        "zero1 placed nothing sharded"

    batch = _batch(rng, 16, 6)
    for step in range(3):
        m_z = tr_z.step(batch, rng=jax.random.PRNGKey(step))
        m_r = tr_r.step(batch, rng=jax.random.PRNGKey(step))
    np.testing.assert_allclose(m_z["total_loss"], m_r["total_loss"],
                               rtol=1e-6)
    f_z, f_r = flatten(tr_z.params), flatten(tr_r.params)
    for k in f_z:
        np.testing.assert_allclose(f_z[k], f_r[k], atol=1e-6, err_msg=k)
    # placement must be stable across steps (no drift/recompile)
    mu2 = [x for x in jax.tree.leaves(tr_z.state.opt_state)
           if hasattr(x, "sharding") and x.ndim >= 1]
    assert any(not x.sharding.is_fully_replicated for x in mu2)


def test_zero1_composes_with_mp(rng):
    """(dp=4, mp=2) mesh: mp-sharded opt leaves gain a dp component on a
    free divisible dim and the step still runs/parses."""
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True, zero1=True)
    mesh = make_mesh(8, mp=2)
    tr = Trainer.build(cfg, tc, V, seed=0, mesh=mesh)

    from jax.sharding import PartitionSpec as P

    specs = {tuple(str(getattr(p, "key", p)) for p in path): x.sharding
             for path, x in jax.tree_util.tree_flatten_with_path(
                 tr.state.opt_state)[0] if hasattr(x, "sharding")}
    # at least one leaf carries BOTH axes
    assert any(set(ax for part in sh.spec for ax in (
        part if isinstance(part, tuple) else (part,)) if ax)
               >= {"dp", "mp"} for sh in specs.values()), specs

    batch = _batch(rng, 16, 6)
    m = tr.step(batch, rng=jax.random.PRNGKey(0))
    assert np.isfinite(m["total_loss"])
    res, _ = tr.parse(batch)
    assert res["cky_bp"].shape[0] == 16


def test_zero1_install_state_preserves_placement(rng):
    """Resume path: install_state must re-apply the ZeRO-1 opt-state
    placement (else the first resumed step recompiles against
    differently-placed inputs)."""
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True, zero1=True)
    mesh = make_mesh(8)
    tr = Trainer.build(cfg, tc, V, seed=0, mesh=mesh)
    batch = _batch(rng, 16, 6)
    tr.step(batch, rng=jax.random.PRNGKey(0))

    before = [x.sharding for x in jax.tree.leaves(tr.state.opt_state)
              if hasattr(x, "sharding")]
    host_params = jax.tree.map(np.asarray, tr.state.params)
    host_opt = jax.tree.map(np.asarray, tr.state.opt_state)
    tr.install_state(host_params, host_opt)
    leaves = [x for x in jax.tree.leaves(tr.state.opt_state)
              if hasattr(x, "sharding")]
    assert len(before) == len(leaves)
    for sh0, leaf in zip(before, leaves):
        assert sh0.is_equivalent_to(leaf.sharding, leaf.ndim), \
            (sh0, leaf.sharding)
    assert any(not x.sharding.is_fully_replicated for x in leaves)
    m = tr.step(batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(m["total_loss"])
