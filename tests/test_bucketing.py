"""Masked length-bucketing parity: a sentence of true length m padded to a
length-n bucket must produce the SAME charts, losses, gradients, and CKY
trees as the exact length-m program.

This supersedes the reference's one-XLA-program-per-exact-length discipline
(cliora/data/dataloader.py:11-113) -- padded buckets cut the compile count
to the number of buckets while the masks keep the math identical.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.chart.offsets import cell_index, ncells
from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_params
from cliora_tpu.training.trainer import TrainConfig, Trainer, compute_losses

D, E, V, R, F = 16, 24, 60, 4, 32
PAD = 0


def _pad(sents, n):
    B, L = sents.shape
    out = np.full((B, n), PAD, sents.dtype)
    out[:, :L] = sents
    return out


def _valid_cells(n_pad, m):
    """[(flat_padded, flat_exact)] for every cell of the length-m chart."""
    pairs = []
    for level in range(m):
        for pos in range(m - level):
            pairs.append((int(cell_index(n_pad, level, pos)),
                          int(cell_index(m, level, pos))))
    return pairs


@pytest.fixture(scope="module")
def setup():
    # attn_dropout off: dropout masks are shape-dependent, which would
    # break exact-vs-padded comparison (and train=True needs an rng)
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=R,
                      obj_feat_size=F, attn_dropout=0.0)
    tc = TrainConfig(lr=1e-3, k_neg=7, vg_loss=True, use_contr=True,
                     emb_trainable=True)
    params = init_params(jax.random.PRNGKey(3), cfg, V)
    # perturb so inside/outside scores are non-trivial (incl. the
    # zero-init image encoder, reference parity trap)
    from oracle import perturb_params

    return cfg, tc, perturb_params(params)


def _losses(cfg, tc, params, sents, obj, neg, lengths=None, rng=None):
    _, metrics = compute_losses(
        cfg, tc, params, jnp.asarray(sents), jnp.asarray(neg),
        obj_feats=jnp.asarray(obj), rng=rng, train=True,
        lengths=None if lengths is None else jnp.asarray(lengths, jnp.int32))
    return metrics


def test_padded_losses_match_exact(setup, rng):
    cfg, tc, params = setup
    B, m, n = 6, 5, 9
    sents = rng.randint(2, V, (B, m)).astype(np.int32)
    obj = rng.randn(B, R, F).astype(np.float32)
    neg = rng.choice(V, 7, replace=False)

    exact = _losses(cfg, tc, params, sents, obj, neg)
    padded = _losses(cfg, tc, params, _pad(sents, n), obj, neg,
                     lengths=[m] * B)
    for k in exact:
        np.testing.assert_allclose(
            np.asarray(padded[k]), np.asarray(exact[k]),
            rtol=2e-5, atol=1e-6, err_msg=k)


def test_padded_grads_match_exact(setup, rng):
    cfg, tc, params = setup
    B, m, n = 4, 4, 7
    sents = rng.randint(2, V, (B, m)).astype(np.int32)
    obj = rng.randn(B, R, F).astype(np.float32)
    neg = rng.choice(V, 7, replace=False)

    def total(p, sents, lengths):
        t, _ = compute_losses(
            cfg, tc, p, jnp.asarray(sents), jnp.asarray(neg),
            obj_feats=jnp.asarray(obj), rng=None, train=True,
            lengths=lengths)
        return t

    g_exact = jax.grad(total)(params, sents, None)
    g_pad = jax.grad(total)(params, _pad(sents, n),
                            jnp.full((B,), m, jnp.int32))
    flat_e, _ = jax.tree_util.tree_flatten_with_path(g_exact)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pad)
    for (path, ge), (_, gp) in zip(flat_e, flat_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(ge), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_padded_charts_match_exact_mixed_lengths(setup, rng):
    """Each example of a mixed-length padded batch reproduces its own
    exact-length chart cell-for-cell (inside AND outside)."""
    from cliora_tpu.models.diora import (
        diora_forward,
        embed_forward,
        image_encoder_forward,
    )

    cfg, tc, params = setup
    n = 8
    ms = [3, 8, 5, 6]
    B = len(ms)
    sents = rng.randint(2, V, (B, n)).astype(np.int32)
    obj = rng.randn(B, R, F).astype(np.float32)

    def fwd(tok, feats, lengths):
        xs, xw = embed_forward(params["embed"], jnp.asarray(tok))
        os_, ow = image_encoder_forward(
            params["img_encoder"], jnp.asarray(feats))
        return diora_forward(
            cfg, params, xs, xw, obj_span=os_, obj_word=ow, train=False,
            with_cky=True, lengths=lengths)

    out_pad = fwd(sents, obj, jnp.asarray(ms, jnp.int32))

    for b, m in enumerate(ms):
        out_ex = fwd(sents[b:b + 1, :m], obj[b:b + 1], None)
        pairs = _valid_cells(n, m)
        pi = np.asarray([p for p, _ in pairs])
        ei = np.asarray([e for _, e in pairs])
        for name, pad_arr, ex_arr in [
            ("inside_h", out_pad.chart.inside_h, out_ex.chart.inside_h),
            ("inside_s", out_pad.chart.inside_s, out_ex.chart.inside_s),
            ("outside_h", out_pad.chart.outside_h, out_ex.chart.outside_h),
            ("outside_s", out_pad.chart.outside_s, out_ex.chart.outside_s),
        ]:
            np.testing.assert_allclose(
                np.asarray(pad_arr)[b, pi], np.asarray(ex_arr)[0, ei],
                rtol=2e-4, atol=1e-5, err_msg=f"{name} b={b} m={m}")


def test_padded_cky_tree_matches_exact(setup, rng):
    from cliora_tpu.analysis.trees import bp_to_tree
    from cliora_tpu.models.diora import diora_forward, embed_forward

    cfg, tc, params = setup
    text_cfg = ModelConfig(size=D, input_size=E)  # text-only DIORA
    tparams = init_params(jax.random.PRNGKey(5), text_cfg, V)
    n, m, B = 10, 6, 5
    sents = rng.randint(2, V, (B, m)).astype(np.int32)

    def fwd(tok, lengths):
        xs, xw = embed_forward(tparams["embed"], jnp.asarray(tok))
        return diora_forward(text_cfg, tparams, xs, xw, train=False,
                             with_cky=True, lengths=lengths)

    bp_ex = np.asarray(fwd(sents, None).chart.cky_bp)
    bp_pad = np.asarray(
        fwd(_pad(sents, n), jnp.full((B,), m, jnp.int32)).chart.cky_bp)
    for b in range(B):
        assert (bp_to_tree(n, bp_pad[b], length=m)
                == bp_to_tree(m, bp_ex[b])), b


def test_choose_buckets_and_bucket_for():
    from cliora_tpu.data.batching import bucket_for, choose_buckets

    lens = [4] * 10 + [5] * 10 + [7] * 5 + [12] * 2
    buckets = choose_buckets(lens, 3)
    assert buckets[-1] == 12  # max always covered
    assert len(buckets) <= 3
    assert bucket_for(buckets, 6) >= 6
    assert bucket_for(buckets, 12) == 12


def test_choose_buckets_work_policy():
    """The work DP (a) covers the max, (b) returns existing lengths,
    (c) never models worse than quantile edges, (d) splits a long tail
    that quantile leaves as one bucket, (e) degrades to the exact
    lengths when n_buckets >= #distinct."""
    from cliora_tpu.data.batching import bucket_for, choose_buckets

    rs = np.random.RandomState(7)
    lens = np.clip(np.round(np.exp(rs.normal(2.45, 0.45, 5000))), 5,
                   40).astype(int).tolist()

    def modeled(edges, floor=10.0):
        return sum(floor ** 3 + bucket_for(edges, n) ** 3 for n in lens)

    for n in (3, 6, 10):
        q = choose_buckets(lens, n, policy="quantile")
        w = choose_buckets(lens, n, policy="work")
        assert w[-1] == max(lens)
        assert len(w) <= n
        assert set(w) <= set(lens)
        assert w == sorted(w)
        assert modeled(w) <= modeled(q)
    # tail split: quantile-10's last gap spans most of the range; the
    # work edges cut the worst-case padding ratio in the tail
    q10 = choose_buckets(lens, 10, policy="quantile")
    w10 = choose_buckets(lens, 10, policy="work")
    gap = lambda e: max(b / a for a, b in zip([min(lens)] + e[:-1], e))
    assert gap(w10) < gap(q10)
    assert choose_buckets([4, 4, 9], 5, policy="work") == [4, 9]
    with pytest.raises(ValueError):
        choose_buckets(lens, 3, policy="nope")


def test_choose_buckets_work_properties(rng):
    """Randomized-corpus properties of the work DP (it steers the
    headline envelope number, VERDICT r4 item 7): edges are observed
    lengths, include the max, never exceed n_buckets, and are optimal --
    hence never worse than quantile edges OR any random candidate edge
    set -- under the cost model."""
    from cliora_tpu.data.batching import bucket_for, choose_buckets

    def modeled(edges, lens, floor):
        return sum(floor ** 3 + bucket_for(edges, n) ** 3 for n in lens)

    for trial in range(20):
        rs = np.random.RandomState(100 + trial)
        kind = trial % 4
        if kind == 0:    # lognormal caption-like
            lens = np.clip(np.round(np.exp(rs.normal(
                rs.uniform(1.5, 3.0), rs.uniform(0.2, 0.8),
                rs.randint(10, 2000)))), 1, 60).astype(int)
        elif kind == 1:  # uniform
            lens = rs.randint(1, rs.randint(5, 50), rs.randint(5, 500))
        elif kind == 2:  # bimodal
            lens = np.concatenate([
                rs.randint(3, 8, rs.randint(5, 200)),
                rs.randint(30, 42, rs.randint(5, 200))])
        else:            # heavy ties / few distinct
            lens = rs.choice([4, 5, 9, 40], rs.randint(4, 300))
        lens = lens.tolist()
        n_buckets = int(rs.randint(1, 12))
        floor = float(rs.uniform(0.0, 15.0))
        w = choose_buckets(lens, n_buckets, policy="work",
                           floor_len=floor)
        distinct = sorted(set(lens))
        assert w == sorted(set(w))
        assert set(w) <= set(distinct)
        assert w[-1] == max(lens)
        assert len(w) <= n_buckets
        if len(distinct) <= n_buckets:
            assert w == distinct
        cost_w = modeled(w, lens, floor)
        q = choose_buckets(lens, n_buckets, policy="quantile")
        assert cost_w <= modeled(q, lens, floor) + 1e-6
        # optimality vs random candidate edge sets (must cover the max)
        for _ in range(5):
            k = rs.randint(1, min(n_buckets, len(distinct)) + 1)
            cand = sorted(set(rs.choice(distinct, k).tolist())
                          | {max(lens)})
            if len(cand) > n_buckets:
                continue  # over the bucket budget: not a fair rival
            assert cost_w <= modeled(cand, lens, floor) + 1e-6, (
                trial, w, cand)


def test_choose_buckets_edge_cases():
    from cliora_tpu.data.batching import bucket_for, choose_buckets

    assert choose_buckets([], 4) == []
    assert choose_buckets([7], 4) == [7]
    assert choose_buckets([7] * 100, 1, policy="work") == [7]
    assert choose_buckets([3, 9], 1, policy="work") == [9]
    # bucket_for round-trips
    assert bucket_for([5, 9], 1) == 5
    assert bucket_for([5, 9], 5) == 5
    assert bucket_for([5, 9], 6) == 9
    assert bucket_for([5, 9], 9) == 9
    assert bucket_for([5, 9], 12) == 12   # beyond last edge: identity
    assert bucket_for([], 4) == 4         # no buckets: identity


def test_bucketed_training_matches_unbucketed(rng):
    """Same corpus, same seeds: the bucketed run compiles fewer programs
    but steps through the SAME batches with the SAME losses."""
    from cliora_tpu.data.batching import BatchIterator
    from cliora_tpu.data.datasets import SimpleDataset
    from cliora_tpu.data.sampler import NegativeSampler

    sents = [list(rng.randint(2, V, rng.randint(4, 10)))
             for _ in range(48)]
    freq = np.ones(V)

    def run(length_buckets, train):
        ds = SimpleDataset(sents)
        sampler = NegativeSampler(freq, 0.75)
        sampler.set_seed(99)  # identical negatives across the two runs
        it = BatchIterator(
            ds, negative_sampler=sampler, k_neg=7,
            batch_size=4, prefetch=0, length_buckets=length_buckets)
        cfg = ModelConfig(size=D, input_size=E)
        tc = TrainConfig(lr=1e-3, k_neg=7, emb_trainable=True)
        tr = Trainer.build(cfg, tc, V, seed=0)
        losses, widths = [], set()
        for batch_map in it.get_iterator(random_seed=123):
            widths.add(batch_map["sentences"].shape[1])
            if length_buckets:
                assert batch_map["lengths"][0] == batch_map["length"]
            m = tr.step(batch_map, train=train,
                        rng=jax.random.PRNGKey(7) if train else None)
            losses.append(float(m["total_loss"]))
        return losses, widths

    # fixed params: per-batch losses must match tightly
    base, widths_base = run(None, train=False)
    bucketed, widths_b = run([6, 9], train=False)
    assert widths_b <= {6, 9}
    assert len(widths_b) < len(widths_base)
    np.testing.assert_allclose(bucketed, base, rtol=2e-5, atol=1e-6)

    # training run: per-step float noise between differently-shaped XLA
    # programs compounds through the param updates, so looser tolerance
    base, _ = run(None, train=True)
    bucketed, _ = run([6, 9], train=True)
    np.testing.assert_allclose(bucketed, base, rtol=2e-2, atol=1e-3)


def test_trainer_step_accepts_lengths(setup, rng):
    cfg, tc, params = setup
    tr = Trainer(cfg, tc, params)
    B, m, n = 4, 4, 6
    sents = rng.randint(2, V, (B, m)).astype(np.int32)
    batch = {
        "sentences": _pad(sents, n),
        "lengths": np.full((B,), m, np.int64),
        "neg_samples": rng.choice(V, 7, replace=False),
        "obj_feats": rng.randn(B, R, F).astype(np.float32),
    }
    metrics = tr.step(batch, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_contrastive_ignores_other_examples_pad_cells(rng):
    """Heterogeneous-length batches: one example's pad-cell garbage must
    not leak into another example's contrastive hinge (the image-side
    mean runs over texts, so text-side weighting alone is not enough)."""
    from cliora_tpu.training.losses import (
        contrastive_loss_from_scores,
        valid_cell_mask,
    )

    B, n = 3, 6
    NC = ncells(n)
    lengths = np.asarray([6, 4, 3], np.int32)
    ins = jnp.asarray(rng.randn(B, NC, 1).astype(np.float32))
    outs = jnp.asarray(rng.randn(B, NC, 1).astype(np.float32))
    scores = jnp.asarray(rng.randn(B, B, NC).astype(np.float32))

    valid = np.asarray(valid_cell_mask(n, jnp.asarray(lengths)))
    garbage = jnp.asarray(1e4 * (1.0 - valid.astype(np.float32)))  # (B, NC)
    # corrupt every pad (text, cell) slot in all per-text arrays;
    # scores axis order is (B_text, B_img, NC)
    ins_g = ins + garbage[:, :, None]
    outs_g = outs - garbage[:, :, None]
    scores_g = scores + garbage[:, None, :]

    kw = dict(margin=0.2, alpha_contr=1.0, lengths=jnp.asarray(lengths))
    clean = float(contrastive_loss_from_scores(ins, outs, scores, **kw))
    dirty = float(contrastive_loss_from_scores(ins_g, outs_g, scores_g,
                                               **kw))
    np.testing.assert_allclose(dirty, clean, rtol=1e-5, atol=1e-5)


def test_blocked_dispatch_order():
    """--batch_order blocked: same-shape batches arrive in runs of K so
    steps_per_call can fuse them into one dispatch; coverage and
    within-bucket randomization are unchanged."""
    from cliora_tpu.data.batching import BucketBatchSampler

    lengths = ([5] * 40 + [7] * 37 + [11] * 22 + [14] * 9)
    K = 5
    rng = np.random.RandomState(0)
    sampler = BucketBatchSampler(lengths, [8, 14], batch_size=4,
                                 include_partial=True, rng=rng,
                                 dispatch_group=K)
    seen, run_lens, cur_key, cur = [], [], None, 0
    per_key_batches = {}
    for edge, idx in sampler:
        seen.extend(idx)
        per_key_batches[edge] = per_key_batches.get(edge, 0) + 1
        if edge == cur_key:
            cur += 1
        else:
            if cur_key is not None:
                run_lens.append(cur)
            cur_key, cur = edge, 1
    run_lens.append(cur)
    # every example exactly once
    assert sorted(seen) == list(range(len(lengths)))
    # bucket 8 holds 77 examples -> 20 batches; bucket 14 holds 31 -> 8
    assert per_key_batches == {8: 20, 14: 8}
    # all runs are K batches long except at most one remainder per key
    # (20 = 5+5+5+5 exact, 8 = 5+3) -- adjacent same-key runs may merge
    assert all(r >= K or r in (3,) or r % K == 0 for r in run_lens), \
        run_lens
    short = [r for r in run_lens if r % K not in (0,)]
    assert len(short) <= 2

    # dispatch_group=1 keeps the uniform-shuffle path byte-identical
    a = list(BucketBatchSampler(lengths, [8, 14], batch_size=4,
                                include_partial=True,
                                rng=np.random.RandomState(3)))
    b = list(BucketBatchSampler(lengths, [8, 14], batch_size=4,
                                include_partial=True,
                                rng=np.random.RandomState(3),
                                dispatch_group=1))
    assert a == b


def test_blocked_order_cli_plumbing():
    """--batch_order blocked reaches the train iterator with
    dispatch_group = --steps_per_call (train mode only)."""
    from cliora_tpu.scripts.common import (get_train_iterator,
                                           get_validation_iterator)
    from cliora_tpu.utils.flags import argument_parser, parse_args

    sents = [[i % 5 for i in range(n)] for n in [5] * 30 + [9] * 30]
    dset = {"sentences": sents,
            "word2idx": {f"w{i}": i for i in range(5)}, "extra": {}}
    opt = parse_args(argument_parser(),
                     ["--batch_size", "4", "--n_length_buckets", "2",
                      "--mixed_buckets", "--steps_per_call", "6",
                      "--batch_order", "blocked", "--emb", "none"])
    assert get_train_iterator(opt, dset).dispatch_group == 6
    # validation keeps exact order semantics
    assert get_validation_iterator(opt, dset).dispatch_group == 1
