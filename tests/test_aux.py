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
