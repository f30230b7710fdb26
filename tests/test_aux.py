"""Auxiliary parity pieces: batch padding, catalan, index self-checks,
word-grounding baseline, visualization."""

import os

import numpy as np

from cliora_tpu.chart.indices import (
    check_inside_components,
    check_outside_components,
    get_catalan,
)
from cliora_tpu.data.batching import BatchIterator
from cliora_tpu.data.datasets import SimpleDataset


def test_get_catalan():
    assert get_catalan(2) == 1
    assert get_catalan(3) == 2
    assert get_catalan(4) == 5
    assert get_catalan(5) == 14
    assert get_catalan(11) == 5000  # capped


def test_index_self_checks():
    for n in range(2, 10):
        for level in range(1, n):
            assert check_inside_components(n, level), (n, level)
        for level in range(0, n - 1):
            assert check_outside_components(n, level), (n, level)


def test_padded_partial_batches():
    sentences = [[1, 2, 3]] * 5  # 5 examples, batch 4 -> surplus 1
    it = BatchIterator(SimpleDataset(sentences),
                       extra={"example_ids": list(range(5))},
                       batch_size=4, include_partial=True,
                       pad_batches=True)
    batches = list(it.get_iterator(random_seed=0))
    assert len(batches) == 2
    sizes = sorted((bm["batch_size"], bm["real_size"]) for bm in batches)
    assert sizes == [(4, 1), (4, 4)]
    # padded rows repeat real examples (still well-formed)
    for bm in batches:
        assert bm["sentences"].shape == (4, 3)
        assert len(bm["example_ids"]) == 4


def test_padded_partial_batches_with_buckets():
    """pad_batches + include_partial + length_buckets compose: every
    emitted batch has shape (batch_size, bucket_edge) — the bounded
    compile set production training relies on — with real_size and the
    true-lengths vector intact."""
    sentences = ([[1, 2, 3]] * 5 + [[1, 2, 3, 4, 5]] * 3
                 + [[1, 2, 3, 4, 5, 6, 7]] * 2)
    it = BatchIterator(SimpleDataset(sentences),
                       extra={"example_ids": list(range(10))},
                       batch_size=4, include_partial=True,
                       pad_batches=True, length_buckets=[4, 8])
    batches = list(it.get_iterator(random_seed=0))
    assert {bm["sentences"].shape for bm in batches} <= {(4, 4), (4, 8)}
    seen = []
    for bm in batches:
        assert bm["padded_length"] in (4, 8)
        assert bm["lengths"].shape == (4,)
        true_len = int(bm["lengths"][0])
        assert (bm["lengths"] == true_len).all()
        assert bm["length"] == true_len
        assert true_len <= bm["padded_length"]
        # pad columns beyond the true length are zeros
        assert (bm["sentences"][:, true_len:] == 0).all()
        seen += bm["example_ids"][:bm["real_size"]]
    assert sorted(seen) == list(range(10))  # every example trains once


def test_word_grounding_baseline(rng):
    import jax.numpy as jnp
    from cliora_tpu.models.word_grounding import word_grounding_forward

    B, L, R, D = 3, 5, 4, 8
    xw = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    ow = jnp.asarray(rng.randn(B, R, D).astype(np.float32))
    out = word_grounding_forward(xw, ow)
    assert out.vg_atten_score.shape == (B, B, L, R)
    np.testing.assert_allclose(
        np.asarray(out.atten_score[1]),
        np.asarray(out.vg_atten_score[1, 1]), rtol=1e-6)


def test_visualize_batch(tmp_path, rng):
    import cv2

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "flickr30k_images"))
    img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(root, "flickr30k_images", "777.jpg"), img)

    from cliora_tpu.analysis.visualize import visualize_batch

    B, L, R = 1, 3, 4
    atten = rng.randn(B, L, R).astype(np.float32)
    tokens = np.asarray([[1, 2, 0]])
    boxes = np.asarray([[[1, 1, 30, 30]] * R], np.float32)
    idx2word = {0: "a", 1: "dog", 2: "runs"}
    written = visualize_batch(atten, tokens, ["777"], boxes, idx2word,
                              img_root=root)
    assert written and os.path.exists(written[0])


def test_spans_to_tree():
    from cliora_tpu.analysis.trees import spans_to_tree

    # ((0 1) (2 3)) over 4 tokens
    tree = spans_to_tree([(0, 2), (2, 2), (0, 4)], list(range(4)))
    assert tree == ((0, 1), (2, 3))


def test_hard_aggregation_runs(rng):
    import jax
    import jax.numpy as jnp
    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.models.params import init_diora_params
    from cliora_tpu.ops.chart_pass import run_chart
    from cliora_tpu.ops.core import unit_norm

    cfg = ModelConfig(size=16, aggregate="hard")
    dp = init_diora_params(jax.random.PRNGKey(0), cfg)
    x = rng.randn(2, 6, 16).astype(np.float32)
    h0 = unit_norm(jnp.tanh(
        x @ dp["inside_compose"]["leaf_fc"]["w"].T
        + dp["inside_compose"]["leaf_fc"]["b"]))
    out = run_chart(cfg, dp, h0, with_cky=True, outside=True)
    assert np.isfinite(np.asarray(out.inside_h)).all()
    assert np.isfinite(np.asarray(out.outside_h)).all()
    # with hard aggregation, each cell's h is exactly the argmax split's
    # composed vector -- s_agg equals the max split score
    s = np.asarray(out.inside_s)[..., 0]
    assert np.isfinite(s).all()


def test_vestigial_index_helpers():
    from cliora_tpu.chart.indices import (
        inside_index,
        inside_index_unique,
        outside_index,
        topk_outside_index,
    )
    from cliora_tpu.chart.offsets import level_offsets

    n, level = 7, 3
    uniq = inside_index_unique(n, level)
    # exactly the cells of levels < level
    assert uniq.tolist() == list(range(int(level_offsets(n)[level])))
    par, sis = outside_index(n, level)
    par2, sis2 = topk_outside_index(n, level, K=2)
    # same multiset, position-major regrouping
    assert sorted(zip(par.tolist(), sis.tolist())) == \
        sorted(zip(par2.tolist(), sis2.tolist()))


def test_nli_reader(tmp_path):
    import json as _json
    from cliora_tpu.data.readers import NLIReader

    path = str(tmp_path / "snli.jsonl")
    ex = {
        "gold_label": "entailment", "pairID": "p1",
        "sentence1_binary_parse": "( ( A dog ) runs )",
        "sentence2_binary_parse": "( An ( animal moves ) )",
    }
    bad = dict(ex, gold_label="-", pairID="p2")
    with open(path, "w") as f:
        f.write(_json.dumps(ex) + "\n")
        f.write(_json.dumps(bad) + "\n")
    out = NLIReader().read(path)
    assert out["sentences"] == [["a", "dog", "runs"],
                                ["an", "animal", "moves"]]
    assert out["extra"]["example_ids"] == ["p1_1", "p1_2"]


def test_actions_spans_roundtrip_random_trees(rng):
    """Property: tree -> string -> actions -> spans == tree_to_spans."""
    from cliora_tpu.analysis.trees import (
        get_actions,
        get_spans,
        tree_to_spans,
        tree_to_string,
    )

    def random_tree(leaves):
        if len(leaves) == 1:
            return leaves[0]
        k = rng.randint(1, len(leaves))
        return (random_tree(leaves[:k]), random_tree(leaves[k:]))

    for n in [2, 3, 5, 9, 14]:
        for _ in range(10):
            tree = random_tree(list(range(n)))
            words = [f"w{i}" for i in range(n)]
            actions = get_actions(tree_to_string(tree, words))
            assert get_spans(actions) == tree_to_spans(tree)
