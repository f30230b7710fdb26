"""Generate a synthetic PCFG corpus in the PTB pickle format
({'other_data': rows, 'word2idx'}; row[0]=sentence, row[5]=gold spans)
that PTBReader consumes (cliora_tpu/data/readers.py PTBReader; reference
format: cliora/data/reading.py:343-385).

The grammar has clean distributional word classes, so DIORA's
reconstruction objective can recover the constituent structure -- used to
demonstrate grammar induction (eval F1 above the right-branching
baseline), not just loss descent.

Usage: python tools/make_synthetic_ptb.py out_dir [n_train] [n_valid]
           [emb_dim] [emb_noise]
"""

import os
import pickle
import sys

import numpy as np


def make_vocab():
    classes = {
        "det": [f"det{i}" for i in range(6)],
        "adj": [f"adj{i}" for i in range(30)],
        "n": [f"noun{i}" for i in range(120)],
        "v": [f"verb{i}" for i in range(60)],
        "p": [f"prep{i}" for i in range(8)],
        "pos": ["posmk"],                      # possessive marker ('s)
        "aux": [f"aux{i}" for i in range(4)],
    }
    return classes


def sample_tree(rng, classes, depth=0):
    """Sample a binarized derivation: returns nested tuple of words.

    Mixes left-branching (possessives, V-NP-PP) and right-branching
    (adjective chains, auxiliaries) constructions so neither the
    right- nor left-branching baseline is near-optimal.
    """
    def w(cls):
        return rng.choice(classes[cls])

    def np_(d):
        r = rng.random()
        if r < 0.35 or d > 2:
            return (w("det"), w("n"))
        if r < 0.50:                    # Det (Adj N): right-branching
            return (w("det"), (w("adj"), w("n")))
        if r < 0.80:                    # ((NP pos) N): left-branching
            return ((np_(d + 1), w("pos")), w("n"))
        return (w("det"), (w("n"), w("n")))   # compound noun

    def pp(d):
        return (w("p"), np_(d + 1))

    def vp(d):
        r = rng.random()
        if r < 0.40 or d > 1:
            return (w("v"), np_(d + 1))
        if r < 0.65:
            # VP -> (V NP) PP, binarized left
            return ((w("v"), np_(d + 1)), pp(d + 1))
        if r < 0.85:
            return (w("aux"), (w("v"), np_(d + 1)))
        return (w("v"), (np_(d + 1), pp(d + 1)))

    return (np_(depth), vp(depth))


def tree_leaves(tree):
    if isinstance(tree, str):
        return [tree]
    return tree_leaves(tree[0]) + tree_leaves(tree[1])


def tree_spans(tree):
    """Internal-node spans, inclusive indices, root LAST (the eval loop
    drops gold[-1] as the root, analysis/eval.py)."""
    spans = []

    def helper(tr, start):
        if isinstance(tr, str):
            return 1
        left = helper(tr[0], start)
        right = helper(tr[1], start + left)
        spans.append((start, start + left + right - 1))
        return left + right

    helper(tree, 0)
    return spans


def write_embeddings(path, classes, dim=64, noise=0.15, seed=7):
    """Class-structured fixed embeddings (GloVe text format, --emb w2v).

    Grammar induction on this corpus needs FIXED pretrained-style
    embeddings whose geometry exposes the word classes: with a trainable
    table (--emb none) eval F1 plateaus ~0.35, with these it climbs past
    the right-branching baseline (BASELINE.md grammar-induction table).
    Each word = its class centroid + small isotropic noise.
    """
    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for words in classes.values():
            base = rng.randn(dim)
            for word in words:
                vec = base + noise * rng.randn(dim)
                f.write(word + " "
                        + " ".join(f"{v:.4f}" for v in vec) + "\n")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "synthetic_ptb"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    n_valid = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    os.makedirs(out_dir, exist_ok=True)
    classes = make_vocab()

    word2idx = {"<unk>": 0}
    for cls in classes.values():
        for word in cls:
            word2idx[word] = len(word2idx)

    def make_split(n, seed):
        rng = np.random.RandomState(seed)
        rows = []
        while len(rows) < n:
            tree = sample_tree(rng, classes)
            leaves = tree_leaves(tree)
            if not 4 <= len(leaves) <= 16:
                continue
            # row layout: sentence, -, -, -, -, gold spans (PTBReader
            # reads row[0] and row[5])
            rows.append([" ".join(leaves), None, None, None, None,
                         tree_spans(tree)])
        return {"other_data": rows, "word2idx": word2idx}

    for name, n, seed in [("train", n_train, 1), ("valid", n_valid, 2)]:
        path = os.path.join(out_dir, f"{name}.pkl")
        blob = make_split(n, seed)
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        lens = [len(r[0].split()) for r in blob["other_data"]]
        print(f"{path}: {len(lens)} sentences, len {min(lens)}-{max(lens)},"
              f" vocab {len(word2idx)}")

    emb_dim = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    emb_noise = float(sys.argv[5]) if len(sys.argv) > 5 else 0.15
    emb_path = os.path.join(out_dir, "glove.txt")
    write_embeddings(emb_path, classes, dim=emb_dim, noise=emb_noise)
    print(f"{emb_path}: class-structured fixed embeddings (--emb w2v)")


if __name__ == "__main__":
    main()
