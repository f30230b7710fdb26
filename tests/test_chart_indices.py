"""Chart index-set equivalence tests.

Brute-force span enumeration is the oracle (this resurrects the logic of
the reference's vestigial self-checkers, cliora/net/inside_index.py:24-47
and cliora/net/outside_index.py:65-90, as real tests).
"""

import numpy as np
import pytest

from cliora_tpu.chart import (
    ncells,
    level_offsets,
    cell_index,
    cell_span,
    span_to_cell,
    inside_index,
    outside_index,
    outside_mask,
    inside_components,
    outside_components,
)


def all_spans(n):
    return [(i, j) for i in range(n) for j in range(i + 1, n + 1)]


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 12, 40])
def test_offsets_roundtrip(n):
    offs = level_offsets(n)
    assert offs[0] == 0
    assert ncells(n) == n * (n + 1) // 2
    # Every (level, pos) maps to a unique flat index and back.
    seen = set()
    for level in range(n):
        for pos in range(n - level):
            idx = int(cell_index(n, level, pos))
            assert idx == offs[level] + pos
            assert idx not in seen
            seen.add(idx)
            s, e = cell_span(n, idx)
            assert (int(s), int(e)) == (pos, pos + level + 1)
            assert int(span_to_cell(n, pos, pos + level + 1)) == idx
    assert len(seen) == ncells(n)
    assert max(seen) == ncells(n) - 1


@pytest.mark.parametrize("n", list(range(2, 13)))
def test_inside_index_matches_bruteforce(n):
    for level in range(1, n):
        L, N = n - level, level
        idx_l, idx_r = inside_index(n, level)
        assert idx_l.shape == idx_r.shape == (L * N,)
        for p in range(L):
            target = (p, p + level + 1)
            # All split decompositions of the target, as span pairs.
            expected = set()
            for split in range(target[0] + 1, target[1]):
                expected.add(((target[0], split), (split, target[1])))
            got = set()
            for k in range(N):
                j = p * N + k
                l_span = tuple(int(x) for x in cell_span(n, idx_l[j]))
                r_span = tuple(int(x) for x in cell_span(n, idx_r[j]))
                # children must be adjacent and exactly cover the target
                assert l_span[1] == r_span[0]
                assert (l_span[0], r_span[1]) == target
                got.add((l_span, r_span))
            assert got == expected


@pytest.mark.parametrize("n", list(range(2, 13)))
def test_outside_index_matches_bruteforce(n):
    for level in range(0, n - 1):
        L = n - level
        N = L - 1
        par_idx, sis_idx = outside_index(n, level)
        assert par_idx.shape == sis_idx.shape == (N * L,)
        for p in range(L):
            i, j = p, p + level + 1
            # Oracle: every strictly-larger span sharing one boundary.
            expected = set()
            for a in range(0, i):
                expected.add(((a, j), (a, i)))
            for b in range(j + 1, n + 1):
                expected.add(((i, b), (j, b)))
            got = set()
            for c in range(N):
                e = c * L + p
                par = tuple(int(x) for x in cell_span(n, par_idx[e]))
                sis = tuple(int(x) for x in cell_span(n, sis_idx[e]))
                # parent = target union sibling; sibling adjacent to target
                assert par[0] == min(i, sis[0]) and par[1] == max(j, sis[1])
                assert sis[1] == i or sis[0] == j
                got.add((par, sis))
            assert got == expected
            assert len(got) == N


@pytest.mark.parametrize("n,n_valid", [(8, 8), (8, 5), (12, 7), (12, 3)])
def test_outside_mask_padded(n, n_valid):
    for level in range(0, n - 1):
        L = n - level
        mask = outside_mask(n, level, n_valid)
        assert mask.shape == (L - 1, L)
        par_idx, _ = outside_index(n, level)
        par_idx = par_idx.reshape(L - 1, L)
        for c in range(L - 1):
            for p in range(L):
                s, e = cell_span(n, par_idx[c, p])
                target_ok = p + level + 1 <= n_valid
                expected = bool(target_ok and e <= n_valid)
                assert bool(mask[c, p]) == expected
        # Sanity: each *valid* target at a level below the valid root keeps
        # exactly (n_valid - level - 1) active combinations.
        if level <= n_valid - 2:
            for p in range(0, n_valid - level):
                assert mask[:, p].sum() == n_valid - level - 1


def test_components_agree_with_indices():
    n = 9
    for level in range(1, n):
        comps = inside_components(n, level)
        idx_l, idx_r = inside_index(n, level)
        for j, (tgt, l, r) in enumerate(comps):
            assert int(span_to_cell(n, *l)) == idx_l[j]
            assert int(span_to_cell(n, *r)) == idx_r[j]
    for level in range(0, n - 1):
        comps = outside_components(n, level)
        par_idx, sis_idx = outside_index(n, level)
        for e, (tgt, par, sis) in enumerate(comps):
            assert int(span_to_cell(n, *par)) == par_idx[e]
            assert int(span_to_cell(n, *sis)) == sis_idx[e]
