"""Tests for the representation-export scripts (phrase_embed,
phrase_embed_simple, convert_conll_to_jsonl) and the COCO data path --
the CLI surfaces the round-2 review flagged as implemented-but-untested.
"""

import json
import os

import numpy as np
import pytest


# ---------------------------------------------------------------- jsonl

TREES = [
    [[["a", "dog"], ["runs", "fast"]], "today"],
    [["the", ["big", "cat"]], ["sits", "down"]],
    [[["a", "cat"], ["sits", "down"]], "today"],
    [["the", ["red", "dog"]], ["runs", "up"]],
]


@pytest.fixture(scope="module")
def jsonl_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("jsonl")
    path = root / "val.jsonl"
    with open(path, "w") as f:
        for i, tree in enumerate(TREES):
            f.write(json.dumps({"example_id": f"ex{i}", "tree": tree})
                    + "\n")
    return str(path)


def _pe_args(path, exp, extra=()):
    return [
        "--data_type", "jsonl", "--emb", "none",
        "--validation_path", path,
        "--experiment_path", exp,
        "--hidden_dim", "16", "--k_neg", "2",
        "--validation_batch_size", "4", "--seed", "3",
    ] + list(extra)


@pytest.mark.parametrize("mode,n_rows_per_ex", [
    ("all-spans", None),   # whole chart: n(n+1)/2 cells
    ("latent", None),      # CKY tree internal nodes: n-1
    ("given", None),       # gold tree internal nodes
])
def test_phrase_embed_simple_modes(jsonl_corpus, tmp_path, mode,
                                   n_rows_per_ex):
    """vectors.csv rows must align 1:1 with vectors.npy rows in every
    mode; the cell indexing (level_offsets[size-1] + pos) is the code
    class that produced the round-2 padded_length decode bug."""
    from cliora_tpu.scripts import phrase_embed_simple

    exp = str(tmp_path / f"pe_{mode}")
    phrase_embed_simple.main(
        _pe_args(jsonl_corpus, exp) + ["--parse_mode", mode])

    with open(os.path.join(exp, "vectors.csv")) as f:
        rows = f.read().strip().split("\n")[1:]  # drop header
    vecs = np.loadtxt(os.path.join(exp, "vectors.npy"))
    if vecs.ndim == 1:
        vecs = vecs[None]
    assert len(rows) == vecs.shape[0], (len(rows), vecs.shape)
    assert vecs.shape[1] == 2 * 16  # [inside; outside]
    assert np.isfinite(vecs).all()

    n = 5  # every corpus sentence has 5 tokens
    per_ex = {"all-spans": n * (n + 1) // 2, "latent": n - 1,
              "given": n - 1}[mode]
    assert len(rows) == len(TREES) * per_ex
    for row in rows:
        ex, pos, size = row.split(",")
        pos, size = int(pos), int(size)
        assert 0 <= pos and pos + size <= n and size >= 1


def test_phrase_embed_given_matches_gold_spans(jsonl_corpus, tmp_path):
    """'given' mode must emit exactly the gold trees' internal spans."""
    from cliora_tpu.scripts import phrase_embed_simple
    from cliora_tpu.scripts.phrase_embed_simple import tree_to_pos_size

    exp = str(tmp_path / "pe_given2")
    phrase_embed_simple.main(
        _pe_args(jsonl_corpus, exp) + ["--parse_mode", "given"])
    with open(os.path.join(exp, "vectors.csv")) as f:
        rows = [r.split(",") for r in f.read().strip().split("\n")[1:]]
    got = {}
    for ex, pos, size in rows:
        got.setdefault(ex, set()).add((int(pos), int(size)))
    for i, tree in enumerate(TREES):
        assert got[f"ex{i}"] == set(tree_to_pos_size(tree))


# ---------------------------------------------------------------- conll

BIO = """\
the DT B-NP
big JJ I-NP
dog NN I-NP
runs VBZ O
fast RB O

a DT B-NP
red JJ I-NP
cat NN I-NP
sits VBZ O
down RB O

the DT B-NP
red JJ I-NP
dog NN I-NP
sits VBZ O
fast RB O

a DT B-NP
big JJ I-NP
cat NN I-NP
runs VBZ O
down RB O
"""


def test_convert_conll_and_phrase_embed(tmp_path, capsys):
    """BIO conll -> jsonl (converter) -> [inside;outside] phrase vectors
    with nearest-neighbor search (exact numpy fallback; no faiss here)."""
    from cliora_tpu.scripts import convert_conll_to_jsonl, phrase_embed

    bio = tmp_path / "train.txt"
    bio.write_text(BIO)
    convert_conll_to_jsonl.main(["--path", str(bio), "--name", "t"])
    out = capsys.readouterr().out.strip().split("\n")
    assert len(out) == 4
    examples = [json.loads(line) for line in out]
    for ex in examples:
        assert ex["entities"] == [["NP", 0, 3]]
        assert len(ex["sentence"]) == 5

    conll = tmp_path / "conll_val.jsonl"
    conll.write_text("\n".join(out) + "\n")

    exp = str(tmp_path / "pe")
    vectors = phrase_embed.main([
        "--data_type", "conll", "--emb", "none",
        "--validation_path", str(conll),
        "--experiment_path", exp,
        "--hidden_dim", "16", "--k_neg", "2",
        "--validation_batch_size", "4", "--seed", "3",
        "--k_candidates", "4", "--k_top", "2",
    ])
    # one NP phrase of size 3 per sentence, unit-normalized [in;out]
    assert vectors.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(vectors, axis=1), 1.0,
                               rtol=1e-5)
    printed = capsys.readouterr().out
    assert "[query]" in printed and "rank=0" in printed


def test_convert_conll_malformed_i_tag(tmp_path, capsys):
    """I without a preceding entity is coerced to B with a warning
    (reference converter tolerance)."""
    from cliora_tpu.scripts import convert_conll_to_jsonl

    bio = tmp_path / "bad.txt"
    bio.write_text("dog NN I-NP\nruns VBZ O\n")
    convert_conll_to_jsonl.main(["--path", str(bio)])
    ex = json.loads(capsys.readouterr().out.strip())
    assert ex["entities"] == [["NP", 0, 1]]
    assert any("Converting I to B" in w for w in ex["warnings"])


# ----------------------------------------------------------------- coco

@pytest.fixture(scope="module")
def coco_corpus(tmp_path_factory):
    """Minimal on-disk COCO layout: caption jsonl x5 per image, vocab
    dict, id_list/{split}.txt, {split}_ims.npy global features
    (reference: cliora/data/reading.py:388-452)."""
    root = tmp_path_factory.mktemp("coco")
    words = ["_PAD", "<unk>", "a", "dog", "cat", "runs", "fast", "the",
             "big", "red"]
    with open(root / "coco.dict.json", "w") as f:
        json.dump({w: i for i, w in enumerate(words)}, f)
    os.makedirs(root / "id_list", exist_ok=True)
    rs = np.random.RandomState(0)
    for split, n_img in (("train", 4), ("test", 2)):
        img_ids = [1000 + i for i in range(n_img)]
        with open(root / "id_list" / f"{split}.txt", "w") as f:
            f.write("\n".join(
                f"COCO_{split}2014_{i:012d}.jpg" for i in img_ids) + "\n")
        if split != "test":
            np.save(root / f"{split}_ims.npy",
                    rs.randn(n_img, 8).astype(np.float32))
        with open(root / f"coco_{split}.json", "w") as f:
            for _ in img_ids:
                for _ in range(5):  # 5 captions per image
                    n = 5
                    sent = " ".join(words[rs.randint(2, len(words))]
                                    for _ in range(n))
                    gold = ([(j, n - 1) for j in range(n - 2, 0, -1)]
                            + [(0, n - 1)])
                    f.write(json.dumps([sent, gold]) + "\n")
    return str(root)


def test_coco_train_and_eval_cli(coco_corpus, tmp_path):
    """End-to-end on the COCO data layout: reader -> vocab -> batching ->
    1 text-only DIORA epoch -> checkpoint + F1 eval.  (The reference's
    COCO visual path is dead -- `# TODO: COCO`,
    cliora/net/trainer.py:103-105 -- so text-only is the parity
    surface.)"""
    from cliora_tpu.scripts import train as train_script

    exp = str(tmp_path / "exp_coco")
    train_script.main([
        "--data_type", "coco", "--emb", "none",
        "--train_path", os.path.join(coco_corpus, "coco_train.json"),
        "--validation_path", os.path.join(coco_corpus, "coco_test.json"),
        "--experiment_path", exp,
        "--hidden_dim", "16", "--k_neg", "4", "--batch_size", "8",
        "--validation_batch_size", "8", "--lr", "1e-3", "--seed", "3",
        "--max_epoch", "1",
    ])
    assert os.path.exists(os.path.join(exp, "model.epoch_0.npz"))
    assert os.path.exists(os.path.join(exp, "model.best.npz"))


def test_coco_reader_contract(coco_corpus):
    """Reader-level invariants: x5 caption/image alignment, vocab-mapped
    tokens, gold spans carried through."""
    from cliora_tpu.data.readers import COCOReader

    res = COCOReader().read(os.path.join(coco_corpus, "coco_train.json"))
    assert len(res["sentences"]) == 20  # 4 images x 5 captions
    ids = res["extra"]["example_ids"]
    assert [int(i) for i in ids[:5]] == [1000] * 5
    assert len(res["extra"]["image_feats"]) == 20
    assert all(len(gt) >= 1 for gt in res["extra"]["GT"])
    assert res["metadata"]["word2idx"]["_PAD"] == 0
