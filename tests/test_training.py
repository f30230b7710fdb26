"""Loss parity vs. numpy oracles, end-to-end training smoke, freezing,
checkpoint round-trips (native + torch interop)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_params
from cliora_tpu.training.checkpoint import (
    export_torch_checkpoint,
    flatten,
    import_torch_checkpoint,
    load_params,
    save_params,
)
from cliora_tpu.training.losses import (
    contrastive_loss,
    reconstruction_loss,
    vg_loss,
)
from cliora_tpu.training.trainer import (
    TrainConfig,
    Trainer,
    trainable_mask,
)
from cliora_tpu.data.sampler import NegativeSampler, calculate_freq_dist

from oracle import (
    oracle_contrastive_loss,
    oracle_recon_loss,
    oracle_vg_loss,
)

D, E, V = 16, 24, 50


def test_recon_loss_matches_oracle(rng):
    B, L, k = 3, 5, 7
    mat = rng.randn(D, E).astype(np.float32)
    table = rng.randn(V, E).astype(np.float32)
    tokens = rng.randint(0, V, (B, L))
    neg = rng.choice(V, k, replace=False)
    oh = rng.randn(B, 15, D).astype(np.float32)  # ncells(5)=15

    got = reconstruction_loss(
        {"mat": jnp.asarray(mat)}, jnp.asarray(table), jnp.asarray(tokens),
        jnp.asarray(neg), jnp.asarray(oh))
    want = oracle_recon_loss(mat, table, tokens, neg, oh[:, :L])
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_vg_loss_matches_oracle(rng):
    B, L, R = 4, 6, 9
    vg = rng.randn(B, B, L, R).astype(np.float32)
    got = vg_loss(jnp.asarray(vg), alpha_vg=0.7)
    want = oracle_vg_loss(vg, 0.7)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_contrastive_loss_matches_oracle(rng):
    B, NC, R = 3, 10, 5
    ins = rng.randn(B, NC, 1).astype(np.float32) * 0.1
    outs = rng.randn(B, NC, 1).astype(np.float32) * 0.1
    aa = rng.randn(B, B, NC, R).astype(np.float32)
    got = contrastive_loss(jnp.asarray(ins), jnp.asarray(outs),
                           jnp.asarray(aa), margin=0.2, alpha_contr=0.5)
    want = oracle_contrastive_loss(ins[..., 0], outs[..., 0], aa, 0.2, 0.5)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def _synthetic_batch(rs, B, L, vocab):
    return rs.randint(2, vocab, (B, L))


def test_training_loss_decreases(rng):
    """Minimum end-to-end slice: synthetic corpus, loss goes down.

    (SURVEY.md section 7 stage 3 milestone)
    """
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True)
    trainer = Trainer.build(cfg, tc, V, seed=0)

    sentences = _synthetic_batch(rng, 4, 6, V)  # fixed batch: overfit it
    corpus = [s for s in sentences]
    sampler = NegativeSampler(calculate_freq_dist(corpus, V))
    sampler.set_seed(0)
    neg = sampler.sample(tc.k_neg)

    losses = []
    for step in range(60):
        batch = {"sentences": sentences, "neg_samples": neg}
        m = trainer.step(batch, rng=jax.random.PRNGKey(step))
        losses.append(m["total_loss"])
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.5, losses


def test_cliora_losses_train_step(rng):
    """CLIORA losses (vg + contrastive) produce finite grads end-to-end."""
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=4,
                      obj_feat_size=32)
    tc = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True)
    trainer = Trainer.build(cfg, tc, V, seed=1)
    batch = {
        "sentences": _synthetic_batch(rng, 3, 5, V),
        "neg_samples": rng.choice(V, 5, replace=False),
        "obj_feats": rng.randn(3, 4, 32).astype(np.float32),
    }
    m = trainer.step(batch, rng=jax.random.PRNGKey(0))
    for name in ("reconstruction_softmax_loss", "vg_loss",
                 "contrastive_loss", "total_loss"):
        assert name in m and np.isfinite(m[name]), (name, m)
    m2 = trainer.step(batch, rng=jax.random.PRNGKey(1))
    assert m2["total_loss"] != m["total_loss"]


def test_multi_step_matches_per_step(rng):
    """Trainer.steps (K steps per dispatch, lax.scan) must match K
    sequential Trainer.step calls: same metrics, same final params.
    (attn_dropout=0: the two paths draw dropout keys differently, which
    is the only intended divergence.)"""
    B, R, F = 4, 3, 16
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=R,
                      obj_feat_size=F, attn_dropout=0.0)
    tc = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True,
                     emb_trainable=True)
    batches = []
    for i in range(3):
        batches.append({
            "sentences": _synthetic_batch(rng, B, 6, V),
            "neg_samples": rng.choice(V, 5, replace=False),
            "obj_feats": rng.randn(B, R, F).astype(np.float32),
        })

    t1 = Trainer.build(cfg, tc, V, seed=0)
    seq = [dict(t1.step(bm)) for bm in batches]
    t2 = Trainer.build(cfg, tc, V, seed=0)
    grouped = t2.steps(batches)

    assert len(grouped) == 3
    for a, b in zip(seq, grouped):
        for k in a:
            np.testing.assert_allclose(float(a[k]), float(b[k]),
                                       rtol=1e-5, err_msg=k)
    for pa, pb in zip(jax.tree.leaves(t1.params),
                      jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6)


def test_word_grounding_baseline_trains(rng):
    """--arch word (chart-free word-level grounding, reference vg.py
    dead code made selectable): VG loss descends, and parse/eval return
    grounding scores with no trees."""
    B, R, F = 4, 3, 16
    cfg = ModelConfig(size=D, input_size=E, arch="word", use_obj=True,
                      n_regions=R, obj_feat_size=F)
    tc = TrainConfig(lr=1e-2, k_neg=5, vg_loss=True, emb_trainable=True)
    trainer = Trainer.build(cfg, tc, V, seed=0)
    assert "diora" not in trainer.params  # chart-free

    batch = {
        "sentences": _synthetic_batch(rng, B, 6, V),
        "neg_samples": rng.choice(V, 5, replace=False),
        "obj_feats": rng.randn(B, R, F).astype(np.float32),
    }
    losses = []
    for step in range(40):
        m = trainer.step(batch, rng=jax.random.PRNGKey(step))
        losses.append(float(m["total_loss"]))
        assert set(m) == {"vg_loss", "total_loss"}
    assert np.isfinite(losses).all()
    # InfoNCE over B=4 images starts at ln(4); overfitting one batch
    # must drive it well below that
    assert np.mean(losses[-5:]) < 0.5 * np.log(B), losses

    res, metrics = trainer.parse(batch, compute_loss=True)
    assert "cky_bp" not in res
    assert res["atten_score"].shape == (B, 6, R)
    assert np.isfinite(metrics["vg_loss"])


def test_freeze_modes(rng):
    cfg = ModelConfig(size=D, input_size=E)
    batch = {
        "sentences": _synthetic_batch(rng, 2, 4, V),
        "neg_samples": rng.choice(V, 3, replace=False),
    }

    # freeze='diora': diora params unchanged, recon/embed-proj move
    tc = TrainConfig(lr=1e-2, k_neg=3, freeze="diora", emb_trainable=False)
    tr = Trainer.build(cfg, tc, V, seed=2)
    before = flatten(tr.params)
    tr.step(batch)
    after = flatten(tr.params)
    for k in before:
        if k.startswith("diora/") or "embeddings" in k:
            np.testing.assert_array_equal(before[k], after[k], err_msg=k)
    assert not np.array_equal(before["reconstruct/mat"],
                              after["reconstruct/mat"])

    # freeze='except_vis': only *_vis params may move
    cfg2 = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=4,
                       obj_feat_size=32)
    tc2 = TrainConfig(lr=1e-2, k_neg=3, freeze="except_vis", vg_loss=True)
    tr2 = Trainer.build(cfg2, tc2, V, seed=3)
    mask = trainable_mask(tc2, tr2.params)
    flat_mask = {
        k: v for k, v in zip(flatten(tr2.params), jax.tree.leaves(mask))
    }
    assert flat_mask["img_encoder/fc_vis/w"] is True
    assert flat_mask["diora/inside_score/mat"] is False


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=4,
                      obj_feat_size=32)
    params = init_params(jax.random.PRNGKey(7), cfg, V)
    p = os.path.join(tmp_path, "ckpt.npz")
    save_params(p, params)
    params2, missing = load_params(p, jax.tree.map(jnp.zeros_like, params))
    assert not missing
    for k, v in flatten(params).items():
        np.testing.assert_array_equal(v, flatten(params2)[k], err_msg=k)

    # without embeddings: table keeps template values
    p2 = os.path.join(tmp_path, "ckpt_noemb.npz")
    save_params(p2, params, save_embeddings=False)
    template = jax.tree.map(jnp.zeros_like, params)
    params3, missing = load_params(p2, template)
    assert missing == ["embed/embeddings"]
    assert float(jnp.abs(params3["embed"]["embeddings"]).sum()) == 0.0


def test_torch_checkpoint_interop(tmp_path):
    torch = pytest.importorskip("torch")
    del torch
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=4,
                      obj_feat_size=32)
    params = init_params(jax.random.PRNGKey(9), cfg, V)
    p = os.path.join(tmp_path, "ref_style.pt")
    export_torch_checkpoint(p, params)
    template = jax.tree.map(jnp.zeros_like, params)
    params2, missing = import_torch_checkpoint(p, template)
    assert not missing, missing
    for k, v in flatten(params).items():
        np.testing.assert_array_equal(v, flatten(params2)[k], err_msg=k)

    # DIORA -> CLIORA warm start: text-only ckpt leaves img_encoder at
    # its (zero) init, embeddings optionally kept
    cfg_txt = ModelConfig(size=D, input_size=E)
    params_txt = init_params(jax.random.PRNGKey(10), cfg_txt, V)
    p2 = os.path.join(tmp_path, "diora.pt")
    export_torch_checkpoint(p2, params_txt)
    warm, missing = import_torch_checkpoint(p2, template)
    assert set(missing) == {
        "img_encoder/fc/w", "img_encoder/fc/b",
        "img_encoder/fc_vis/w", "img_encoder/fc_vis/b"}
    np.testing.assert_array_equal(
        flatten(warm)["diora/inside_score/mat"],
        flatten(params_txt)["diora/inside_score/mat"])


def test_accum_steps_matches_averaged_grads(rng):
    """accum_steps=2 must equal: per-microbatch grads, averaged, ONE
    optimizer update -- bit-level up to f32 reduction order (the accum
    path sums then divides; the oracle averages the same two trees)."""
    import optax
    from cliora_tpu.training.trainer import compute_losses

    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=3,
                      obj_feat_size=16, attn_dropout=0.0)
    tc = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True,
                     emb_trainable=True, accum_steps=2)
    batch = {
        "sentences": _synthetic_batch(rng, 8, 6, V),
        "neg_samples": rng.choice(V, 5, replace=False),
        "obj_feats": rng.randn(8, 3, 16).astype(np.float32),
    }
    key = jax.random.PRNGKey(7)

    tr = Trainer.build(cfg, tc, V, seed=0)
    m_accum = tr.step(batch, rng=key)

    # oracle: same microbatch split, same rng folding, manual average
    tc0 = TrainConfig(lr=1e-3, k_neg=5, vg_loss=True, use_contr=True,
                      emb_trainable=True)
    tr0 = Trainer.build(cfg, tc0, V, seed=0)
    toks = jnp.asarray(batch["sentences"])
    neg = jnp.asarray(batch["neg_samples"])
    obj = jnp.asarray(batch["obj_feats"])

    def grad_of(sl, i):
        def loss_fn(p):
            return compute_losses(
                cfg, tc0, p, toks[sl], neg, obj_feats=obj[sl],
                rng=jax.random.fold_in(key, i), train=True)
        return jax.grad(loss_fn, has_aux=True)(tr0.params)

    (g0, m0), (g1, m1) = grad_of(slice(0, 4), 0), grad_of(slice(4, 8), 1)
    g = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)
    g = jax.tree.map(lambda x, m: x if m else jnp.zeros_like(x),
                     g, tr0.mask)
    updates, _ = tr0.tx.update(g, tr0.state.opt_state, tr0.params)
    want = optax.apply_updates(tr0.params, updates)

    np.testing.assert_allclose(
        float(m_accum["total_loss"]),
        (float(m0["total_loss"]) + float(m1["total_loss"])) / 2, rtol=1e-6)
    got, want = flatten(tr.params), flatten(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-7, err_msg=k)


def test_accum_steps_cli_smoke(rng, tmp_path):
    """--accum_steps composes with the CLI epoch loop (+ keep-best)."""
    import os as _os

    from cliora_tpu.scripts import train as train_script

    root = tmp_path / "corpus"
    root.mkdir()
    words = [f"w{i}" for i in range(30)]
    with open(root / "train.txt", "w") as f:
        for _ in range(16):
            f.write(" ".join(words[rng.randint(0, 30)]
                             for _ in range(6)) + "\n")
    exp = str(tmp_path / "exp")
    train_script.main([
        "--data_type", "txt", "--emb", "none",
        "--train_path", str(root / "train.txt"),
        "--validation_path", str(root / "train.txt"),
        "--experiment_path", exp, "--hidden_dim", "16", "--k_neg", "4",
        "--batch_size", "8", "--validation_batch_size", "8",
        "--lr", "1e-3", "--max_epoch", "1", "--accum_steps", "2"])
    assert _os.path.exists(_os.path.join(exp, "model.epoch_0.npz"))


def test_accum_steps_with_length_mask(rng):
    """accum_steps composes with masked length-bucketing: the (B,)
    lengths vector is split per microbatch like the tokens."""
    from cliora_tpu.training.trainer import compute_losses

    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True, accum_steps=2)
    L = 8
    toks = _synthetic_batch(rng, 8, L, V)
    lengths = np.asarray([5, 8, 6, 7, 8, 5, 6, 7], np.int32)
    for r, m in enumerate(lengths):
        toks[r, m:] = 0
    batch = {"sentences": toks, "neg_samples": rng.choice(V, 5,
                                                          replace=False),
             "lengths": lengths}

    tr = Trainer.build(cfg, tc, V, seed=0)
    m_accum = tr.step(batch, rng=jax.random.PRNGKey(3))

    tc0 = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True)
    tr0 = Trainer.build(cfg, tc0, V, seed=0)
    neg = jnp.asarray(batch["neg_samples"])

    def loss_of(sl):
        total, _ = compute_losses(
            cfg, tc0, tr0.params, jnp.asarray(toks[sl]), neg,
            rng=None, train=True, lengths=jnp.asarray(lengths[sl]))
        return float(total)

    want = (loss_of(slice(0, 4)) + loss_of(slice(4, 8))) / 2
    np.testing.assert_allclose(float(m_accum["total_loss"]), want,
                               rtol=1e-6)


def test_multi_step_with_accum(rng):
    """--steps_per_call composes with --accum_steps (a lax.scan over
    optimizer steps whose body scans microbatches)."""
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True, accum_steps=2)
    batches = [{
        "sentences": _synthetic_batch(rng, 8, 6, V),
        "neg_samples": rng.choice(V, 5, replace=False),
    } for _ in range(2)]

    t1 = Trainer.build(cfg, tc, V, seed=0)
    seq = [dict(t1.step(bm)) for bm in batches]
    t2 = Trainer.build(cfg, tc, V, seed=0)
    grouped = t2.steps(batches)

    for a, b in zip(seq, grouped):
        np.testing.assert_allclose(float(a["total_loss"]),
                                   float(b["total_loss"]), rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(t1.params),
                      jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6)
