"""Closed-form gather indices for the inside and outside chart passes.

Unlike the reference, which enumerates (child, child) / (parent, sibling)
pairs with nested Python loops per ``(length, level)`` (reference:
cliora/net/inside_index.py:131-197, cliora/net/outside_index.py:39-127),
everything here is derived directly from span algebra as vectorized numpy,
and the resulting int32 arrays are baked as constants into the compiled XLA
program for each length bucket.

Conventions (cell ``(level, pos)`` covers span ``[pos, pos + level + 1)``):

Inside, at target level ``level`` (with ``L = n - level`` targets and
``N = level`` split points):

  * target ``(level, p)`` = span ``[p, p+level+1)``; split ``k`` breaks it
    into left child ``(k, p)`` and right child ``(level-k-1, p+k+1)``.
  * arrays are laid out position-major: entry ``j = p * N + k`` so a gather
    of shape ``(B, L*N, D)`` reshapes to ``(B, L, N, D)`` with the split
    axis last, and the split softmax runs over axis 2.  (Same layout
    contract as the reference's ``.transpose(0,1).flatten()``:
    cliora/net/inside_index.py:192-196.)

Outside, at target level ``level`` (``L = n - level`` targets, and every
target has exactly ``N = L - 1`` (parent, sibling) derivations):

  * target ``(level, p)`` = span ``[i, j) = [p, p+level+1)``.  A parent is
    any strictly-larger span sharing one boundary:
      - left-extension, one per ``a in [0, p)``:  parent ``[a, j)``
        (cell ``(level + p - a, a)``), sibling ``[a, p)``
        (cell ``(p - a - 1, a)``);
      - right-extension, one per ``b in (j, n]``: parent ``[i, b)``
        (cell ``(level + b - j, p)``), sibling ``[j, b)``
        (cell ``(b - j - 1, j)``).
    Count: ``p + (n - j) = n - level - 1 = L - 1`` for every ``p``.
  * arrays are laid out combination-major: entry ``c * L + p`` so the
    gather reshapes to ``(B, N, L, D)`` and the derivation softmax runs
    over axis 1 -- softmax + weighted-sum are permutation-invariant per
    target, so only the *set* per target must match the reference
    (cliora/net/outside_index.py:39-62), not its enumeration order.
    Our per-target order: combination index ``c < p`` selects the
    left-extension with ``a = c``; ``c >= p`` selects the right-extension
    with ``b = j + (c - p) + 1``.

Both index builders also come in a *masked* flavour for padded length
buckets: sentences of true length ``n_valid <= n`` reuse the length-``n``
program; inside indices are valid as-is for valid cells (all derivations of
an in-range span are in-range), while outside combinations that touch
out-of-range parents are masked out of the softmax.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from cliora_tpu.chart.offsets import cell_index, level_offsets, ncells


def inside_index(n: int, level: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gather indices for the inside pass at ``level``.

    Returns ``(idx_l, idx_r)``, each ``(L * N,)`` int32, position-major
    (``j = pos * N + split``), indexing into the flat chart axis.
    """
    assert 1 <= level < n
    L = n - level
    N = level
    p = np.arange(L, dtype=np.int64)[:, None]   # (L, 1) target positions
    k = np.arange(N, dtype=np.int64)[None, :]   # (1, N) split points
    idx_l = cell_index(n, k, np.broadcast_to(p, (L, N)))
    idx_r = cell_index(n, level - k - 1, p + k + 1)
    return (
        idx_l.reshape(-1).astype(np.int32),
        idx_r.reshape(-1).astype(np.int32),
    )


def outside_index(n: int, level: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gather indices for the outside pass at ``level``.

    Returns ``(par_idx, sis_idx)``, each ``(N * L,)`` int32,
    combination-major (``entry = c * L + p``).  ``par_idx`` indexes the
    *outside* chart; ``sis_idx`` indexes the *inside* chart.
    """
    assert 0 <= level <= n - 2
    L = n - level
    N = L - 1
    p = np.arange(L, dtype=np.int64)[None, :]   # (1, L) target positions
    c = np.arange(N, dtype=np.int64)[:, None]   # (N, 1) combination ids
    j = p + level + 1                           # exclusive end of target span

    left = c < p                                # left-extension combos
    a = c                                       # sibling/parent start (left)
    b = j + (c - p) + 1                         # parent end (right)

    par_level = np.where(left, level + p - a, level + b - j)
    par_pos = np.where(left, a, p)
    sis_level = np.where(left, p - a - 1, b - j - 1)
    sis_pos = np.where(left, a, j)

    # Clip to keep cell_index well-defined for combos that would be invalid
    # on shorter padded sentences; at full length every combo is valid.
    par_idx = cell_index(n, np.minimum(par_level, n - 1), par_pos)
    sis_idx = cell_index(n, np.minimum(sis_level, n - 1), sis_pos)
    return (
        par_idx.reshape(-1).astype(np.int32),
        sis_idx.reshape(-1).astype(np.int32),
    )


def outside_mask(n: int, level: int, n_valid: int) -> np.ndarray:
    """Validity mask ``(N, L)`` for padded buckets.

    Entry ``(c, p)`` is True iff the parent span of that combination lies
    inside ``[0, n_valid)`` and the target itself is valid
    (``p + level + 1 <= n_valid``).  With ``n_valid == n`` all entries of
    valid targets are True.
    """
    L = n - level
    N = L - 1
    p = np.arange(L, dtype=np.int64)[None, :]
    c = np.arange(N, dtype=np.int64)[:, None]
    j = p + level + 1
    left = c < p
    b = j + (c - p) + 1
    par_end = np.where(left, j, b)
    target_ok = j <= n_valid
    return (par_end <= n_valid) & target_ok


def inside_components(n: int, level: int):
    """(target, left, right) span triples, for tests / introspection."""
    out = []
    for p in range(n - level):
        for k in range(level):
            target = (p, p + level + 1)
            lchild = (p, p + k + 1)
            rchild = (p + k + 1, p + level + 1)
            out.append((target, lchild, rchild))
    return out


def outside_components(n: int, level: int):
    """(target, parent, sibling) span triples, for tests / introspection."""
    out = []
    L = n - level
    for c in range(L - 1):
        for p in range(L):
            i, j = p, p + level + 1
            if c < p:
                a = c
                parent, sibling = (a, j), (a, i)
            else:
                b = j + (c - p) + 1
                parent, sibling = (i, b), (j, b)
            out.append(((i, j), parent, sibling))
    return out


class ChartIndex:
    """Memoized per-(length, level) index arrays.

    (reference: cliora/net/utils.py:67-134 ``Index``; here the cache is
    host-side numpy only -- the arrays become XLA constants when traced.)
    """

    def __init__(self):
        self._inside: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}
        self._outside: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}
        self._offsets: Dict[int, np.ndarray] = {}

    def offsets(self, n: int) -> np.ndarray:
        if n not in self._offsets:
            self._offsets[n] = level_offsets(n)
        return self._offsets[n]

    def inside(self, n: int, level: int):
        key = (n, level)
        if key not in self._inside:
            self._inside[key] = inside_index(n, level)
        return self._inside[key]

    def outside(self, n: int, level: int):
        key = (n, level)
        if key not in self._outside:
            self._outside[key] = outside_index(n, level)
        return self._outside[key]

    def ncells(self, n: int) -> int:
        return ncells(n)


# Process-wide cache; index arrays are tiny and immutable.
INDEX = ChartIndex()


def inside_index_unique(n: int, level: int) -> np.ndarray:
    """Sorted unique flat cell indices read by the inside step at
    ``level``: all cells of levels < level (every lower cell is some
    target's child).

    (reference: cliora/net/inside_index.py:95-128
    ``get_inside_index_unique`` -- vestigial S-DIORA helper)
    """
    idx_l, idx_r = inside_index(n, level)
    return np.unique(np.concatenate([idx_l, idx_r]))


def topk_outside_index(n: int, level: int, K: int):
    """(parent, sibling) indices regrouped position-major:
    entry ``p * N + c`` (vs. the combination-major outside_index), i.e.
    sorted by (target position, combination).

    (reference: cliora/net/outside_index.py:149-185
    ``get_topk_outside_index`` -- the K argument is unused there too;
    kept for signature parity)
    """
    del K
    par, sis = outside_index(n, level)
    L = n - level
    N = L - 1
    perm = (np.arange(N * L).reshape(N, L).T).reshape(-1)
    return par[perm], sis[perm]


def get_catalan(n: int) -> int:
    """Number of binary trees over ``n`` leaves, capped at 5000 for n > 10.

    (reference: cliora/net/utils.py:58-64 -- only used to sanity-check
    tree counts, hence the overflow-avoiding cap)
    """
    if n > 10:
        return 5000
    from math import comb
    return comb(2 * (n - 1), n - 1) // n


def check_inside_components(n: int, level: int) -> bool:
    """Every (target, left, right) triple is a valid adjacent split.

    (reference: cliora/net/inside_index.py:24-47 ``InsideIndexCheck`` --
    vestigial self-test utility, functional here)
    """
    for (ti, tj), (li, lj), (ri, rj) in inside_components(n, level):
        if not (li == ti and rj == tj and lj == ri and li < lj < rj):
            return False
    return True


def check_outside_components(n: int, level: int) -> bool:
    """Every (target, parent, sibling) triple is a valid derivation:
    parent = target U sibling, adjacent and disjoint.

    (reference: cliora/net/outside_index.py:65-90 ``OutsideIndexCheck``)
    """
    for (ti, tj), (pi, pj), (si, sj) in outside_components(n, level):
        adjacent = sj == ti or si == tj
        covers = (pi, pj) == (min(ti, si), max(tj, sj))
        if not (adjacent and covers and (sj <= ti or si >= tj)):
            return False
    return True
