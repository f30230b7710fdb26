"""Mixed-length batch composition within length buckets.

The model side has been per-example all along (``lengths (B,)`` traced
vector, per-example outside/loss masks); these tests pin the data-layer
half: a batch holding several TRUE lengths padded to one bucket edge
must reproduce, per example, exactly what exact-length batches produce
(losses, grads, CKY trees), and the sampler must drop nothing.

Supersedes the reference's exact-length-only composition
(cliora/data/dataloader.py:11-113), which at B=128 silently drops every
sentence whose exact length can't muster a full batch (VERDICT r4 item 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.data.batching import (
    BatchIterator,
    BucketBatchSampler,
    bucket_for,
)
from cliora_tpu.data.datasets import SimpleDataset
from cliora_tpu.data.sampler import NegativeSampler
from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_params
from cliora_tpu.training.trainer import TrainConfig, Trainer, compute_losses

D, E, V = 16, 24, 60


@pytest.fixture(scope="module")
def text_setup():
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=7, emb_trainable=True)
    params = init_params(jax.random.PRNGKey(3), cfg, V)
    from oracle import perturb_params

    return cfg, tc, perturb_params(params)


def _mixed_corpus(rng, n=60, lo=2, hi=14):
    return [list(map(int, rng.randint(2, V, rng.randint(lo, hi))))
            for _ in range(n)]


# ---------------------------------------------------------------- sampler

def test_bucket_sampler_covers_everything(rng):
    lens = list(rng.randint(2, 15, 200))
    buckets = [6, 10, 14]
    sampler = BucketBatchSampler(lens, buckets, batch_size=8,
                                 include_partial=True,
                                 rng=np.random.RandomState(0))
    seen = []
    for edge, idxs in sampler:
        assert edge in buckets
        assert 0 < len(idxs) <= 8
        for i in idxs:
            assert lens[i] >= 3          # min_length filter
            assert bucket_for(buckets, lens[i]) == edge
        seen += idxs
    expected = [i for i, m in enumerate(lens) if m >= 3]
    assert sorted(seen) == sorted(expected)  # nothing dropped, no dupes


def test_bucket_sampler_full_batches_only():
    lens = [5] * 10 + [9] * 3
    sampler = BucketBatchSampler(lens, [6, 10], batch_size=4,
                                 rng=np.random.RandomState(0))
    batches = list(sampler)
    # 10 -> two full batches of 4 at edge 6; 3 at edge 10 dropped
    assert sorted(e for e, _ in batches) == [6, 6]
    assert all(len(ix) == 4 for _, ix in batches)


def test_bucket_sampler_respects_length_to_size():
    lens = [4] * 6 + [12] * 6
    sampler = BucketBatchSampler(
        lens, [6, 12], batch_size=4, include_partial=True,
        rng=np.random.RandomState(0),
        length_to_size={n: 2 for n in range(7, 13)})
    sizes = {}
    for e, ix in sampler:
        sizes.setdefault(e, []).append(len(ix))
    assert max(sizes[6]) == 4 and max(sizes[12]) == 2


# --------------------------------------------------------------- iterator

def _iterator(sents, buckets, batch_size=8, include_partial=True,
              k_neg=7, pad_batches=False):
    sampler = NegativeSampler(np.ones(V), 0.75)
    sampler.set_seed(99)
    return BatchIterator(
        SimpleDataset(sents), negative_sampler=sampler, k_neg=k_neg,
        batch_size=batch_size, prefetch=0, include_partial=include_partial,
        length_buckets=buckets, mixed_buckets=True,
        pad_batches=pad_batches)


def test_mixed_iterator_batch_maps(rng):
    sents = _mixed_corpus(rng)
    buckets = [6, 10, 14]
    it = _iterator(sents, buckets)
    seen = 0
    for bm in it.get_iterator(random_seed=5):
        B, L = bm["sentences"].shape
        assert L in buckets
        assert bm["padded_length"] == L
        lens = bm["lengths"]
        assert len(lens) == B
        assert bm["length"] == int(lens.max())
        for r in range(B):
            m = int(lens[r])
            assert 3 <= m <= L
            i = bm["index"][r]
            np.testing.assert_array_equal(
                bm["sentences"][r, :m], np.asarray(sents[i], np.int32))
            assert not bm["sentences"][r, m:].any()  # zero padding
        assert bm["neg_samples"].shape == (7,)
        seen += bm["real_size"]
    assert seen == sum(1 for s in sents if len(s) >= 3)  # zero dropped


def test_mixed_iterator_pad_batches(rng):
    sents = _mixed_corpus(rng, n=13)
    it = _iterator(sents, [14], batch_size=8, pad_batches=True)
    shapes = set()
    for bm in it.get_iterator(random_seed=5):
        shapes.add(bm["sentences"].shape)
        assert bm["batch_size"] == 8
        assert bm["real_size"] <= 8
    assert shapes == {(8, 14)}  # one compiled program, period


def test_mixed_requires_buckets():
    with pytest.raises(ValueError):
        BatchIterator(SimpleDataset([[2, 3, 4]]), mixed_buckets=True)


# ------------------------------------------------- loss / grad parity

def test_mixed_recon_loss_matches_exact(text_setup, rng):
    """Mixed-batch recon loss == token-weighted mean of each example's
    exact-length loss (recon is a per-valid-token mean; the chart forward
    is per-example independent)."""
    cfg, tc, params = text_setup
    ms = [3, 7, 5, 6]
    n = 8
    sents = [rng.randint(2, V, m).astype(np.int32) for m in ms]
    neg = rng.choice(V, 7, replace=False)
    padded = np.zeros((len(ms), n), np.int32)
    for r, s in enumerate(sents):
        padded[r, :len(s)] = s

    def loss(tok, lengths):
        t, _ = compute_losses(cfg, tc, params, jnp.asarray(tok),
                              jnp.asarray(neg), rng=None, train=True,
                              lengths=lengths)
        return t

    mixed = float(loss(padded, jnp.asarray(ms, jnp.int32)))
    per = [float(loss(s[None], None)) for s in sents]
    expected = sum(m * l for m, l in zip(ms, per)) / sum(ms)
    np.testing.assert_allclose(mixed, expected, rtol=2e-5, atol=1e-6)


def test_mixed_recon_grads_match_exact(text_setup, rng):
    cfg, tc, params = text_setup
    ms = [4, 6, 3]
    n = 7
    sents = [rng.randint(2, V, m).astype(np.int32) for m in ms]
    neg = rng.choice(V, 7, replace=False)
    padded = np.zeros((len(ms), n), np.int32)
    for r, s in enumerate(sents):
        padded[r, :len(s)] = s

    def loss(p, tok, lengths):
        t, _ = compute_losses(cfg, tc, p, jnp.asarray(tok),
                              jnp.asarray(neg), rng=None, train=True,
                              lengths=lengths)
        return t

    g_mixed = jax.grad(loss)(params, padded, jnp.asarray(ms, jnp.int32))
    gs = [jax.grad(loss)(params, s[None], None) for s in sents]
    tot = float(sum(ms))
    g_exp = jax.tree.map(
        lambda *xs: sum(m * x for m, x in zip(ms, xs)) / tot, *gs)
    flat_m, _ = jax.tree_util.tree_flatten_with_path(g_mixed)
    flat_e, _ = jax.tree_util.tree_flatten_with_path(g_exp)
    for (path, gm), (_, ge) in zip(flat_m, flat_e):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(ge), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_mixed_decode_matches_exact(text_setup, rng):
    """CKY trees decoded from one mixed padded batch == each example's
    exact-length decode."""
    from cliora_tpu.analysis.trees import decode_batch
    from cliora_tpu.models.diora import diora_forward, embed_forward

    cfg, _, params = text_setup
    ms = [3, 8, 5, 6, 4]
    n = 8
    sents = [rng.randint(2, V, m).astype(np.int32) for m in ms]
    padded = np.zeros((len(ms), n), np.int32)
    for r, s in enumerate(sents):
        padded[r, :len(s)] = s

    def fwd(tok, lengths):
        xs, xw = embed_forward(params["embed"], jnp.asarray(tok))
        return diora_forward(cfg, params, xs, xw, train=False,
                             with_cky=True, lengths=lengths)

    bp_mixed = np.asarray(fwd(padded, jnp.asarray(ms, jnp.int32)).chart.cky_bp)
    mixed = decode_batch(bp_mixed, n, np.asarray(ms, np.int32))
    for b, (s, m) in enumerate(zip(sents, ms)):
        bp_ex = np.asarray(fwd(s[None], None).chart.cky_bp)
        (tree_ex, spans_ex), = decode_batch(bp_ex, m)
        assert mixed[b][0] == tree_ex, b
        assert mixed[b][1] == spans_ex, b


# -------------------------------------------------------- trainer + eval

def test_trainer_steps_through_mixed_iterator(text_setup, rng):
    cfg, tc, _ = text_setup
    sents = _mixed_corpus(rng, n=40)
    it = _iterator(sents, [8, 14], batch_size=4, include_partial=False)
    tr = Trainer.build(cfg, tc, V, seed=0)
    n_steps = 0
    for bm in it.get_iterator(random_seed=3):
        m = tr.step(bm, rng=jax.random.PRNGKey(n_steps))
        assert np.isfinite(float(m["total_loss"]))
        n_steps += 1
    assert n_steps >= 2


def test_run_eval_ragged_matches_exact(text_setup, rng):
    """run_eval over mixed-bucket (ragged) batches reports the same
    F1 metrics as over exact-length batches of the same examples."""
    from cliora_tpu.analysis.eval import run_eval
    from cliora_tpu.analysis.trees import tree_to_spans

    cfg, tc, params = text_setup
    tr = Trainer(cfg, tc, params)
    sents = _mixed_corpus(rng, n=36, lo=3, hi=11)

    # gold spans: right-branching skeleton per example, root LAST
    # (run_eval drops gt[bid][-1], reference scripts/train.py:187)
    def gold(m):
        tree = m - 1
        for pos in range(m - 2, -1, -1):
            tree = (pos, tree)
        return tree_to_spans(tree)

    extra = {"GT": [gold(len(s)) for s in sents]}

    def metrics(mixed):
        sampler = NegativeSampler(np.ones(V), 0.75)
        sampler.set_seed(1)
        it = BatchIterator(
            SimpleDataset(sents), extra=extra, negative_sampler=sampler,
            k_neg=7, batch_size=4, prefetch=0, include_partial=True,
            length_buckets=[6, 10] if mixed else None,
            mixed_buckets=mixed)
        return run_eval(tr, it, seed=7)

    exact = metrics(False)
    ragged = metrics(True)
    for k in ("corpus_f1", "sent_f1"):
        np.testing.assert_allclose(ragged[k], exact[k], atol=1e-9,
                                   err_msg=k)
