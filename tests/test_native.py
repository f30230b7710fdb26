"""Parity tests for the native host decode (cliora_tpu/native).

The C extension must reproduce analysis/trees.py's python decode
exactly: same nested-tuple trees, same inclusive spans, same post-order
(root last).  The python path is the oracle.
"""

import numpy as np
import pytest

from cliora_tpu import native
from cliora_tpu.analysis.trees import bp_to_tree, decode_batch, tree_to_spans
from cliora_tpu.chart.offsets import ncells, random_backpointers as _random_bp


@pytest.fixture
def fasttrees():
    mod = native.load()
    if mod is None:
        pytest.skip("no C toolchain available")
    return mod


@pytest.mark.parametrize("n", [1, 2, 3, 5, 9, 20])
def test_decode_batch_matches_python(fasttrees, n):
    rs = np.random.RandomState(n)
    bp = _random_bp(rs, n, B=16)
    trees, spans = fasttrees.decode_batch(bp, n, None)
    for b in range(bp.shape[0]):
        want_tree = bp_to_tree(n, bp[b])
        assert trees[b] == want_tree, (n, b)
        assert spans[b] == tree_to_spans(want_tree), (n, b)


def test_decode_batch_padded_lengths(fasttrees):
    n, B = 12, 8
    rs = np.random.RandomState(0)
    bp = _random_bp(rs, n, B)
    lens = rs.randint(1, n + 1, size=B).astype(np.int32)
    trees, spans = fasttrees.decode_batch(bp, n, lens)
    for b in range(B):
        want = bp_to_tree(n, bp[b], length=int(lens[b]))
        assert trees[b] == want
        assert spans[b] == tree_to_spans(want)


def test_decode_batch_rejects_garbage(fasttrees):
    n = 6
    bp = np.zeros((1, ncells(n)), np.int32)
    bp[0, -1] = n  # root split out of range
    with pytest.raises(ValueError):
        fasttrees.decode_batch(bp, n, None)
    with pytest.raises(ValueError):
        fasttrees.decode_batch(bp, n, np.array([n + 1], np.int32))
    with pytest.raises(ValueError):  # truncated buffer
        fasttrees.decode_batch(bp[:, :-1].copy(), n, None)


def test_dispatch_parity_and_fallback(monkeypatch):
    """trees.decode_batch gives identical results native vs fallback."""
    n, B = 10, 6
    rs = np.random.RandomState(3)
    bp = _random_bp(rs, n, B)
    lens = rs.randint(1, n + 1, size=B).astype(np.int32)

    fast = decode_batch(bp, n, lens)
    monkeypatch.setattr(native, "_CACHE", None)  # force python path
    slow = decode_batch(bp, n, lens)
    assert fast == slow
    # root span is last (callers slice it off for F1)
    for (tree, spans), m in zip(fast, lens):
        if int(m) > 1:
            assert spans[-1] == (0, int(m) - 1)
