"""Inside/outside pass parity vs. the independent numpy oracle, plus
fused-CKY correctness vs. brute-force tree enumeration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.chart.offsets import cell_index, level_offsets, ncells
from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_diora_params
from cliora_tpu.ops.chart_pass import run_chart
from cliora_tpu.ops.core import unit_norm
from cliora_tpu.analysis.trees import bp_to_tree, tree_to_spans

from oracle import (
    oracle_best_tree,
    oracle_inside,
    oracle_leaf,
    oracle_outside,
)

D = 16


def make_params(cfg, seed=0):
    return init_diora_params(jax.random.PRNGKey(seed), cfg)


def to_np(tree):
    return jax.tree.map(np.asarray, tree)


def chart_cells_to_spans(n, arr):
    """(B, ncells, ...) array -> {span: (B, ...)} with exclusive spans."""
    out = {}
    for level in range(n):
        for pos in range(n - level):
            out[(pos, pos + level + 1)] = arr[:, int(cell_index(n, level, pos))]
    return out


@pytest.mark.parametrize("n,share,compress", [
    (2, True, False), (5, True, False), (5, False, False),
    (7, True, True), (9, True, False),
])
def test_inside_outside_matches_oracle(n, share, compress, rng):
    cfg = ModelConfig(size=D, share=share, compress=compress)
    dp = make_params(cfg)
    dpn = to_np(dp)
    B = 3
    x = rng.randn(B, n, D).astype(np.float32)

    h0 = oracle_leaf(dpn, x)
    h_in, s_in, _ = oracle_inside(dpn, h0)
    h_out, s_out = oracle_outside(
        dpn, h_in, s_in, n,
        root_vec=None if compress else dpn["root_vector_out_h"],
        compress_mat=dpn.get("root_mat_out"))

    # jax path: reuse the same leaf math
    h0_j = unit_norm(jnp.tanh(
        x @ dp["inside_compose"]["leaf_fc"]["w"].T
        + dp["inside_compose"]["leaf_fc"]["b"]))
    out = run_chart(cfg, dp, h0_j, outside=True)

    got_h = chart_cells_to_spans(n, np.asarray(out.inside_h))
    got_s = chart_cells_to_spans(n, np.asarray(out.inside_s)[..., 0])
    for span in h_in:
        np.testing.assert_allclose(got_h[span], h_in[span], atol=2e-5,
                                   err_msg=f"inside_h {span}")
        np.testing.assert_allclose(got_s[span], s_in[span], atol=2e-4,
                                   err_msg=f"inside_s {span}")

    got_oh = chart_cells_to_spans(n, np.asarray(out.outside_h))
    got_os = chart_cells_to_spans(n, np.asarray(out.outside_s)[..., 0])
    for span in h_out:
        np.testing.assert_allclose(got_oh[span], h_out[span], atol=2e-5,
                                   err_msg=f"outside_h {span}")
        np.testing.assert_allclose(got_os[span], s_out[span], atol=2e-4,
                                   err_msg=f"outside_s {span}")


def test_cliora_inside_matches_oracle(rng):
    n, B, R = 6, 2, 5
    cfg = ModelConfig(size=D, use_obj=True)
    dp = make_params(cfg)
    dpn = to_np(dp)
    x = rng.randn(B, n, D).astype(np.float32)
    obj = rng.randn(B, R, D).astype(np.float32)

    h0 = oracle_leaf(dpn, x, obj=obj)
    h_in, s_in, _ = oracle_inside(dpn, h0, obj=obj)

    from cliora_tpu.models.diora import leaf_transform
    h0_j, _ = leaf_transform(cfg, dp, jnp.asarray(x), obj_span=jnp.asarray(obj),
                             train=False)
    np.testing.assert_allclose(np.asarray(h0_j), h0, atol=2e-5)
    out = run_chart(cfg, dp, h0_j, obj=jnp.asarray(obj), train=False,
                    outside=True)
    got_h = chart_cells_to_spans(n, np.asarray(out.inside_h))
    for span in h_in:
        np.testing.assert_allclose(got_h[span], h_in[span], atol=2e-5,
                                   err_msg=f"cliora inside_h {span}")


@pytest.mark.parametrize("n", [3, 4, 5, 6])
def test_fused_cky_matches_bruteforce(n, rng):
    cfg = ModelConfig(size=D)
    dp = make_params(cfg, seed=3)
    dpn = to_np(dp)
    B = 4
    x = rng.randn(B, n, D).astype(np.float32)
    h0 = oracle_leaf(dpn, x)
    _, _, raw = oracle_inside(dpn, h0)

    h0_j = unit_norm(jnp.tanh(
        x @ dp["inside_compose"]["leaf_fc"]["w"].T
        + dp["inside_compose"]["leaf_fc"]["b"]))
    out = run_chart(cfg, dp, h0_j, with_cky=True, outside=False)
    bp = np.asarray(out.cky_bp)
    val = np.asarray(out.cky_val)

    for b in range(B):
        best_tree, best_score = oracle_best_tree(raw, n, b)
        got_tree = bp_to_tree(n, bp[b])
        assert tree_to_spans(got_tree) == tree_to_spans(best_tree), (
            got_tree, best_tree)
        np.testing.assert_allclose(val[b, -1], best_score, atol=1e-4)


def test_treelstm_arch_runs(rng):
    n, B = 5, 2
    cfg = ModelConfig(size=D, arch="treelstm")
    dp = make_params(cfg)
    x = jnp.asarray(rng.randn(B, n, D).astype(np.float32))
    from cliora_tpu.models.diora import leaf_transform
    h0, c0 = leaf_transform(cfg, dp, x)
    out = run_chart(cfg, dp, h0, c0=c0, outside=True)
    assert out.inside_c is not None
    assert np.isfinite(np.asarray(out.inside_h)).all()
    assert np.isfinite(np.asarray(out.outside_h)).all()
    # cell states actually carry signal (unlike the zero "c" of mlp arch)
    offs = level_offsets(n)
    assert np.abs(np.asarray(out.inside_c)[:, offs[1]:]).sum() > 0


def test_root_cell_convention():
    n = 6
    assert int(cell_index(n, n - 1, 0)) == ncells(n) - 1



@pytest.mark.parametrize("remat_frac,policy",
                         [(0.0, "full"), (0.6, "full"), (0.0, "dots"),
                          (0.0, "gathers")])
def test_remat_grads_match(rng, remat_frac, policy):
    """cfg.remat (per-level jax.checkpoint; selective via remat_frac,
    residuals per remat_policy) must be a pure memory/compute trade:
    losses and gradients identical to the unremated path."""
    import dataclasses
    from cliora_tpu.training.trainer import TrainConfig, compute_losses
    from cliora_tpu.models.params import init_params

    V, R, F = 50, 3, 12
    cfg = ModelConfig(size=12, input_size=10, use_obj=True, n_regions=R,
                      obj_feat_size=F, attn_dropout=0.0)
    cfg_r = dataclasses.replace(cfg, remat=True, remat_frac=remat_frac,
                                remat_policy=policy)
    tc = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True,
                     emb_trainable=True)
    params = init_params(jax.random.PRNGKey(0), cfg, V)
    from oracle import perturb_params

    params = perturb_params(params)
    toks = jnp.asarray(rng.randint(2, V, (3, 7)))
    neg = jnp.asarray(rng.choice(V, 5, replace=False))
    obj = jnp.asarray(rng.randn(3, R, F).astype(np.float32))

    def total(c, p):
        t, _ = compute_losses(c, tc, p, toks, neg, obj_feats=obj,
                              rng=None, train=True)
        return t

    l0 = float(total(cfg, params))
    l1 = float(total(cfg_r, params))
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    g0 = jax.grad(lambda p: total(cfg, p))(params)
    g1 = jax.grad(lambda p: total(cfg_r, p))(params)
    # checkpointed recompute reorders f32 reductions; tolerance covers
    # reassociation noise only, not a numerics change
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-6)


def test_remat_auto_policy():
    """'--remat auto' decides per compiled shape from the calibrated
    activation-memory estimate: reproduces every measured fit/OOM point
    (BASELINE.md L=40 table) with the default 10 GB budget."""
    import dataclasses
    from cliora_tpu.ops.chart_pass import remat_enabled

    base = ModelConfig(size=400, remat="auto", compute_dtype="bfloat16")
    # measured: B=128/n=40 needs 18.2 GB (OOMs unremated) -> remat
    assert remat_enabled(base, 128, 40, 400)
    # measured fits: B=64/n=40 (186 ms unremated), B=128/n=20, B=256/n=20
    assert not remat_enabled(base, 64, 40, 400)
    assert not remat_enabled(base, 128, 20, 400)
    assert not remat_enabled(base, 256, 20, 400)
    # f32 doubles the bytes: B=128/n=32 crosses only at f32
    f32 = dataclasses.replace(base, compute_dtype="float32")
    assert remat_enabled(f32, 128, 32, 400)
    assert not remat_enabled(base, 128, 32, 400)
    # forced modes ignore the estimate
    assert remat_enabled(dataclasses.replace(base, remat=True), 1, 3, 8)
    assert not remat_enabled(
        dataclasses.replace(base, remat=False), 1024, 48, 1024)
    # budget is steerable (est at B=2/n=6/D=12 bf16 is ~28 KB)
    tight = dataclasses.replace(base, remat_budget_gb=1e-6)
    assert remat_enabled(tight, 2, 6, 12)


def test_remat_auto_grads_match(rng):
    """A forced-auto remat decision (tiny budget) is numerics-neutral,
    and the flag surface round-trips '--remat auto'."""
    import dataclasses
    from cliora_tpu.training.trainer import TrainConfig, compute_losses
    from cliora_tpu.models.params import init_params
    from cliora_tpu.utils.flags import argument_parser

    opts = argument_parser().parse_args(
        ["--remat", "auto", "--remat_budget_gb", "0.000001"])
    assert opts.remat == "auto" and opts.remat_budget_gb == 1e-6
    opts2 = argument_parser().parse_args(["--remat"])
    assert opts2.remat is True
    assert argument_parser().parse_args([]).remat is False

    V = 40
    cfg = ModelConfig(size=12, input_size=10)
    cfg_auto = dataclasses.replace(cfg, remat="auto",
                                   remat_budget_gb=1e-6)
    from cliora_tpu.ops.chart_pass import remat_enabled
    assert remat_enabled(cfg_auto, 3, 7, 12)   # the tiny budget trips it
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True)
    params = init_params(jax.random.PRNGKey(0), cfg, V)
    toks = jnp.asarray(rng.randint(2, V, (3, 7)))
    neg = jnp.asarray(rng.choice(V, 5, replace=False))

    def total(c, p):
        t, _ = compute_losses(c, tc, p, toks, neg, rng=None, train=True)
        return t

    np.testing.assert_allclose(float(total(cfg_auto, params)),
                               float(total(cfg, params)), rtol=1e-6)
    g0 = jax.grad(lambda p: total(cfg, p))(params)
    g1 = jax.grad(lambda p: total(cfg_auto, p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-6)
