"""Independent numpy oracle for the inside-outside recursion.

Implemented directly from the span recursion with dict-of-spans storage --
deliberately sharing no code (index math, chart layout, vectorization) with
cliora_tpu, so it catches index/layout bugs in the real implementation.
"""

import numpy as np


def np_unit(x, eps=1e-8):
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, eps)


def np_norm(mode, x):
    return np_unit(x) if mode == "unit" else x


def np_linear(p, x):
    return x @ np.asarray(p["w"]).T + np.asarray(p["b"])


def np_mlp(cp, l, r):
    x = np.concatenate([l, r], axis=-1)
    h = np.maximum(np_linear(cp["fc0"], x), 0)
    return np.maximum(np_linear(cp["fc1"], h), 0)


def np_bilinear(mat, a, b):
    return np.sum((a @ np.asarray(mat)) * b, axis=-1)


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_attend(h, obj, temp=1.0):
    # (B, L, D) x (B, R, D) -> (B, L, D); eval mode (no dropout)
    score = np.einsum("bld,brd->blr", h, obj) / temp
    prob = np_softmax(score, axis=-1)
    return np.einsum("blr,brd->bld", prob, obj)


def oracle_leaf(dp, x, mode="unit", obj=None):
    h = np.tanh(np_linear(dp["inside_compose"]["leaf_fc"], x))
    if obj is not None:
        h = np_norm(mode, h)
        h = h + np_attend(h, obj)
    return np_norm(mode, h)


def oracle_inside(dp, h0, mode="unit", obj=None):
    """h0: (B, n, D) leaf vectors.  Returns dicts span->(h, s, raw_scores).

    raw_scores[(i, j)]: (B, nsplits) raw (un-normalized) split scores in
    split order m = i+1 .. j-1.
    """
    B, n, D = h0.shape
    cp = dp["inside_compose"]
    mat = dp["inside_score"]["mat"]
    h_tab, s_tab, raw = {}, {}, {}
    for i in range(n):
        h_tab[(i, i + 1)] = h0[:, i]
        s_tab[(i, i + 1)] = np.zeros((B,), np.float32)
    for size in range(2, n + 1):
        for i in range(0, n - size + 1):
            j = i + size
            hs, ss = [], []
            for m in range(i + 1, j):
                hl, hr = h_tab[(i, m)], h_tab[(m, j)]
                hs.append(np_mlp(cp, hl, hr))
                ss.append(np_bilinear(mat, hl, hr) + s_tab[(i, m)] + s_tab[(m, j)])
            hs = np.stack(hs, axis=1)          # (B, N, D)
            ss = np.stack(ss, axis=1)          # (B, N)
            p = np_softmax(ss, axis=1)
            h = np_norm(mode, (hs * p[..., None]).sum(1))
            if obj is not None:
                h = np_norm(mode, h + np_attend(h[:, None], obj)[:, 0])
            h_tab[(i, j)] = h
            s_tab[(i, j)] = (ss * p).sum(1)
            raw[(i, j)] = ss
    return h_tab, s_tab, raw


def oracle_outside(dp, h_in, s_in, n, mode="unit", root_vec=None,
                   compress_mat=None):
    B = next(iter(h_in.values())).shape[0]
    D = next(iter(h_in.values())).shape[-1]
    cp = dp.get("outside_compose", dp["inside_compose"])
    mat = dp.get("outside_score", dp["inside_score"])["mat"]
    h_out, s_out = {}, {}
    if compress_mat is not None:
        root = h_in[(0, n)] @ np.asarray(compress_mat)
    else:
        root = np.broadcast_to(np.asarray(root_vec)[None], (B, D))
    h_out[(0, n)] = np_norm(mode, root)
    s_out[(0, n)] = np.zeros((B,), np.float32)
    for size in range(n - 1, 0, -1):
        for i in range(0, n - size + 1):
            j = i + size
            hs, ss = [], []
            # left-extended parents [a, j), sibling [a, i)
            for a in range(0, i):
                sib_h, sib_s = h_in[(a, i)], s_in[(a, i)]
                par_h, par_s = h_out[(a, j)], s_out[(a, j)]
                hs.append(np_mlp(cp, sib_h, par_h))
                ss.append(np_bilinear(mat, sib_h, par_h) + sib_s + par_s)
            # right-extended parents [i, b), sibling [j, b)
            for b in range(j + 1, n + 1):
                sib_h, sib_s = h_in[(j, b)], s_in[(j, b)]
                par_h, par_s = h_out[(i, b)], s_out[(i, b)]
                hs.append(np_mlp(cp, sib_h, par_h))
                ss.append(np_bilinear(mat, sib_h, par_h) + sib_s + par_s)
            if not hs:
                continue
            hs = np.stack(hs, axis=1)
            ss = np.stack(ss, axis=1)
            p = np_softmax(ss, axis=1)
            h_out[(i, j)] = np_norm(mode, (hs * p[..., None]).sum(1))
            s_out[(i, j)] = (ss * p).sum(1)
    return h_out, s_out


def oracle_best_tree(raw_scores, n, b):
    """Brute-force max-scoring binary tree for batch element ``b``.

    Scores each full binary tree as sum over internal nodes of the
    max-normalized split score (+1 per leaf, as the reference CKY chart
    initializes leaves to 1, cliora/analysis/cky.py:39).
    """
    norm = {
        span: ss[b] - ss[b].max() for span, ss in raw_scores.items()
    }

    def enumerate_trees(i, j):
        if j - i == 1:
            return [(i, 1.0)]
        out = []
        for m in range(i + 1, j):
            for lt, lv in enumerate_trees(i, m):
                for rt, rv in enumerate_trees(m, j):
                    sc = lv + rv + norm[(i, j)][m - i - 1]
                    out.append(((lt, rt), sc))
        return out

    trees = enumerate_trees(0, n)
    return max(trees, key=lambda t: t[1])


# ---- loss oracles (independent numpy re-derivations of the reference
# loss math, cliora/net/trainer.py:25-171) ----


def oracle_recon_loss(mat, table, tokens, neg, outside_h_leaves):
    """mat: (D,E); table: (V,E); tokens: (B,L); neg: (k,);
    outside_h_leaves: (B,L,D)."""
    B, L = tokens.shape
    losses = []
    for b in range(B):
        for l in range(L):
            cell = outside_h_leaves[b, l]
            pos = table[tokens[b, l]] @ mat.T @ cell
            negs = [table[w] @ mat.T @ cell for w in neg]
            logits = np.array([pos] + negs)
            logits = logits - logits.max()
            losses.append(-(logits[0] - np.log(np.exp(logits).sum())))
    return float(np.mean(losses))


def oracle_vg_loss(vg_atten, alpha):
    """vg_atten: (B,B,L,R)."""
    B, _, L, _ = vg_atten.shape
    logits = vg_atten.max(-1).sum(-1) / L   # (B,B)
    losses = []
    for i in range(B):
        row = logits[i] - logits[i].max()
        losses.append(-(row[i] - np.log(np.exp(row).sum())))
    return float(alpha * np.mean(losses))


def oracle_contrastive_loss(inside_s, outside_s, all_atten, margin, alpha):
    """inside_s/outside_s: (B,NC); all_atten: (B,B,NC,R)."""
    B, NC = inside_s.shape
    scores = all_atten.max(-1)              # (B,B,NC)
    vl = np.zeros((B, NC))
    for s in range(NC):
        m = scores[:, :, s]                 # text x image
        for i in range(B):
            # text->image: images j vs own image i
            lt = [max(margin + m[i, j] - m[i, i], 1e-8)
                  for j in range(B) if j != i]
            # image->text: texts j vs own text i (for image i)
            li = [max(margin + m[j, i] - m[i, i], 1e-8)
                  for j in range(B) if j != i]
            vl[i, s] = np.sum(lt) / B + np.sum(li) / B
    margs = np.exp(inside_s + outside_s - inside_s[:, -1:])
    return float(alpha * np.mean((margs * vl)[:, : NC // 2].sum(-1)))


def perturb_params(params, scale=0.1):
    """Deterministic per-leaf parameter perturbation for tests.

    Seeds derive from the leaf shape via a stable arithmetic hash --
    ``hash(str(shape))`` is salted by PYTHONHASHSEED and made test runs
    non-reproducible (advisor finding, round 2).  Shared by the bf16 /
    bucketing / chart-pass / serving suites.
    """
    import jax

    return jax.tree.map(
        lambda x: x + scale * jax.random.normal(
            jax.random.PRNGKey(
                sum(d * 31 ** i for i, d in enumerate(x.shape)) % 2**31),
            x.shape),
        params)
