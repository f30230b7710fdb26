"""Data layer: same-length batching, batch iterator, readers, HDF5
features, embedding providers, and ELMo char-CNN parity vs. the
reference's vendored torch implementation."""

import json
import os
import pickle
import sys

import numpy as np
import pytest

from cliora_tpu.data.batching import BatchIterator, FixedLengthBatchSampler
from cliora_tpu.data.datasets import FlickrDataset, SimpleDataset
from cliora_tpu.data.embeddings import (
    elmo_cache_path,
    get_embeddings,
    read_glove,
)
from cliora_tpu.data.preprocessing import build_text_vocab, indexify
from cliora_tpu.data.readers import FlickrReader
from cliora_tpu.data.dataset import ReconstructDataset, make_batch_iterator
from cliora_tpu.data.sampler import NegativeSampler, calculate_freq_dist


class Opt:
    """Minimal options namespace."""
    def __init__(self, **kw):
        self.lowercase = True
        self.emb = "none"
        self.obj_feats = False
        self.data_type = None
        self.k_neg = 5
        self.freq_dist_power = 0.75
        for k, v in kw.items():
            setattr(self, k, v)


def test_fixed_length_sampler_batches(rng):
    lengths = [3] * 10 + [5] * 7 + [9] * 2
    sampler = FixedLengthBatchSampler(lengths, batch_size=4,
                                      rng=np.random.RandomState(0))
    batches = list(sampler)
    # full batches only: 2 of len-3, 1 of len-5, 0 of len-9
    assert len(batches) == 3
    for b in batches:
        assert len(b) == 4
        assert len({lengths[i] for i in b}) == 1
    # include_partial adds the surplus batches
    sampler = FixedLengthBatchSampler(lengths, batch_size=4,
                                      include_partial=True,
                                      rng=np.random.RandomState(0))
    batches = list(sampler)
    assert sorted(len(b) for b in batches) == [2, 2, 3, 4, 4, 4]
    seen = sorted(i for b in batches for i in b)
    assert seen == list(range(19))


def test_length_to_size():
    lengths = [4] * 8 + [20] * 8
    sampler = FixedLengthBatchSampler(
        lengths, batch_size=8, length_to_size={10: 2},
        rng=np.random.RandomState(0))
    sizes = {len(b) for b in sampler}
    assert sizes == {8, 2}


def test_batch_iterator_contents(rng):
    sentences = [[1, 2, 3], [4, 5, 6], [7, 8, 9], [1, 1, 1]]
    extra = {"example_ids": ["a", "b", "c", "d"],
             "GT": [[(0, 1)], [(1, 2)], [(0, 2)], [(0, 1)]]}
    sampler = NegativeSampler(calculate_freq_dist(sentences, 10))
    sampler.set_seed(0)
    it = BatchIterator(SimpleDataset(sentences), extra=extra,
                       negative_sampler=sampler, k_neg=3, batch_size=2)
    batches = list(it.get_iterator(random_seed=0))
    assert len(batches) == 2
    for bm in batches:
        assert bm["sentences"].shape == (2, 3)
        assert bm["neg_samples"].shape == (3,)
        assert bm["batch_size"] == 2 and bm["length"] == 3
        for i, idx in enumerate(bm["index"]):
            assert extra["example_ids"][idx] == bm["example_ids"][i]
            assert extra["GT"][idx] == bm["GT"][i]
            assert sentences[idx] == bm["sentences"][i].tolist()


def test_batch_iterator_process_sharding(rng):
    sentences = [[i, i] for i in range(8)]
    it = BatchIterator(SimpleDataset(sentences),
                       extra={"example_ids": list(range(8))},
                       batch_size=4, process_index=1, process_count=2)
    bm = next(it.get_iterator(random_seed=0))
    assert bm["sentences"].shape == (2, 2)   # local half of batch 4
    assert [sentences[i] for i in bm["index"]] == \
        bm["sentences"].tolist()


def _write_flickr_corpus(root):
    """Tiny flickr-format corpus."""
    vocab = {"<unk>": 0, "a": 1, "dog": 2, "runs": 3, "fast": 4, "the": 5}
    with open(os.path.join(root, "flickr.dic.json"), "w") as f:
        json.dump(vocab, f)
    lines = [
        ["a dog runs", [(0, 1), (0, 2)]],
        ["the dog runs fast", [(1, 2), (0, 3)]],
        ["a zebra runs", [(0, 2)]],
    ]
    with open(os.path.join(root, "flickr_test.json"), "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write("100\t0\n100\t1\n200\t0\n")
    anno = {"100_0": [{(0, 1): [[0, 0, 10, 10]]}, [3]],
            "200_0": [{(0, 2): [[1, 1, 5, 5]]}, [3]]}
    with open(os.path.join(root, "gt_anno_test.pkl"), "wb") as f:
        pickle.dump(anno, f)
    return vocab


def test_flickr_reader(tmp_path):
    root = str(tmp_path)
    vocab = _write_flickr_corpus(root)
    out = FlickrReader().read(os.path.join(root, "flickr_test.json"))
    assert out["metadata"]["word2idx"] == vocab
    assert out["sentences"][0] == ["a", "dog", "runs"]
    assert out["sentences"][2] == ["a", "<unk>", "runs"]  # zebra OOV
    assert out["extra"]["example_ids"] == ["100", "100", "200"]
    assert out["extra"]["GT"][0] == [(0, 1), (0, 2)]
    assert out["extra"]["VG_GT"][0][0] == {(0, 1): [[0, 0, 10, 10]]}
    assert out["extra"]["VG_GT"][1] == [{}, None]  # sent_id 1 not in anno


def _write_maf_features(root, mode="test"):
    import h5py

    img_ids = [100, 200]
    n_boxes = [3, 40]   # second image overflows the 36-box cap
    total = sum(n_boxes)
    feats = np.arange(total * 2048, dtype=np.float32).reshape(total, 2048)
    boxes = np.arange(total * 4, dtype=np.float32).reshape(total, 4)
    pos = np.zeros((2, 2), np.int64)
    pos[0] = (0, 3)
    pos[1] = (3, 43)
    with h5py.File(os.path.join(root, f"{mode}_features_compress.hdf5"),
                   "w") as f:
        f.create_dataset("features", data=feats)
        f.create_dataset("bboxes", data=boxes)
        f.create_dataset("pos_bboxes", data=pos)
    with open(os.path.join(root, f"{mode}_imgid2idx.pkl"), "wb") as f:
        pickle.dump({100: 0, 200: 1}, f)
    det = {"100": {"classes": ["cat", "dog", "dog"]},
           "200": {"classes": ["dog"] * 40}}
    with open(os.path.join(root, f"{mode}_detection_dict.json"), "w") as f:
        json.dump(det, f)
    with open(os.path.join(root, "objects_vocab.txt"), "w") as f:
        f.write("cat\ndog\n")


def test_flickr_dataset_hdf5(tmp_path):
    root = str(tmp_path) + "/"
    _write_maf_features(root)
    ds = FlickrDataset([[1, 2], [3, 4]], ["100", "200"], mode="test",
                       data_path=root)
    idx, toks, feats, boxes, cates = ds[0]
    assert feats.shape == (36, 2048) and boxes.shape == (36, 4)
    assert (feats[3:] == 0).all()          # padded beyond 3 boxes
    assert (boxes[3:] == -1).all()
    assert cates[:3].tolist() == [0, 1, 1]  # cat, dog, dog
    assert (cates[3:] == -1).all()
    _, _, feats2, _, cates2 = ds[1]
    assert (feats2 != 0).any() and feats2.shape == (36, 2048)  # truncated 40->36
    assert (cates2 == 1).all()


def test_read_glove(tmp_path):
    path = os.path.join(str(tmp_path), "glove.txt")
    with open(path, "w") as f:
        f.write("dog 1.0 2.0 3.0\n")
        f.write("cat 4.0 5.0 6.0\n")
        f.write("runs 7.0 8.0 9.0\n")
    word2idx = build_text_vocab([["dog", "runs", "zebra"]])
    emb, new_w2i = read_glove(path, word2idx)
    assert new_w2i["_PAD"] == 0 and new_w2i["_"] == 1
    assert emb.shape == (len(new_w2i), 3)
    np.testing.assert_array_equal(emb[new_w2i["dog"]], [1, 2, 3])
    np.testing.assert_array_equal(emb[new_w2i["zebra"]], [0, 0, 0])  # OOV
    # second pass with sentinel keeps mapping stable
    emb2, w2i2 = read_glove(path, new_w2i)
    assert w2i2 == new_w2i


def test_elmo_cache_ingestion(tmp_path):
    """A reference-format cache file is reused without running the CNN."""
    word2idx = {"dog": 0, "cat": 1, "ant": 2}
    cache_dir = str(tmp_path)
    cached = np.random.RandomState(0).randn(3, 512).astype(np.float32)
    np.save(elmo_cache_path(cache_dir, word2idx), cached)

    opt = Opt(emb="elmo", elmo_cache_dir=cache_dir,
              elmo_options_path=None, elmo_weights_path=None)
    emb, w2i = get_embeddings(opt, None, word2idx)
    assert emb.shape == (3, 1024)
    # sorted order is ant, cat, dog -> reorder to word2idx order
    np.testing.assert_array_equal(emb[w2i["ant"]][:512], cached[0])
    np.testing.assert_array_equal(emb[w2i["dog"]][:512], cached[2])
    np.testing.assert_array_equal(emb[w2i["dog"]][512:], cached[2])


def _write_tiny_elmo_weights(root):
    """Random tiny ELMo weight/options files in the standard layout."""
    import h5py

    rs = np.random.RandomState(42)
    options = {
        "char_cnn": {
            "activation": "relu",
            "embedding": {"dim": 4},
            "filters": [[1, 4], [2, 8], [3, 16]],
            "max_characters_per_token": 50,
            "n_characters": 262,
            "n_highway": 2,
        },
        "lstm": {"projection_dim": 12},
    }
    opt_path = os.path.join(root, "options.json")
    with open(opt_path, "w") as f:
        json.dump(options, f)
    w_path = os.path.join(root, "weights.hdf5")
    n_filters = 4 + 8 + 16
    with h5py.File(w_path, "w") as f:
        f.create_dataset("char_embed", data=rs.randn(261, 4) * 0.1)
        cnn = f.create_group("CNN")
        for i, (width, num) in enumerate(options["char_cnn"]["filters"]):
            cnn.create_dataset(f"W_cnn_{i}",
                               data=rs.randn(1, width, 4, num) * 0.1)
            cnn.create_dataset(f"b_cnn_{i}", data=rs.randn(num) * 0.1)
        for k in range(2):
            g = f.create_group(f"CNN_high_{k}")
            g.create_dataset("W_transform",
                             data=rs.randn(n_filters, n_filters) * 0.1)
            g.create_dataset("b_transform", data=rs.randn(n_filters) * 0.1)
            g.create_dataset("W_carry",
                             data=rs.randn(n_filters, n_filters) * 0.1)
            g.create_dataset("b_carry", data=rs.randn(n_filters) * 0.1)
        proj = f.create_group("CNN_proj")
        proj.create_dataset("W_proj", data=rs.randn(n_filters, 12) * 0.1)
        proj.create_dataset("b_proj", data=rs.randn(12) * 0.1)
    return opt_path, w_path


def test_elmo_char_cnn_matches_reference_torch(tmp_path):
    """Our JAX char-CNN == the reference's vendored torch encoder."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from cliora.external.standalone_elmo import (
            ElmoCharacterEncoder,
            batch_to_ids,
            remove_sentence_boundaries,
        )
    finally:
        sys.path.pop(0)

    opt_path, w_path = _write_tiny_elmo_weights(str(tmp_path))
    tokens = ["dog", "a", "extraordinarily", "<S>", "zebra-like"]

    ref_enc = ElmoCharacterEncoder(options_file=opt_path,
                                   weight_file=w_path)
    with torch.no_grad():
        ids = batch_to_ids([[t] for t in tokens])
        out = ref_enc(ids)
        want = remove_sentence_boundaries(
            out["token_embedding"], out["mask"])[0].squeeze(1).numpy()

    from cliora_tpu.data.elmo import embed_tokens
    got = embed_tokens(tokens, opt_path, w_path)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_reconstruct_dataset_synthetic():
    opt = Opt(data_type="synthetic", synthetic_nexamples=20,
              synthetic_vocabsize=30)
    dset = ReconstructDataset().initialize(opt, data_type="synthetic")
    assert len(dset["sentences"]) == 20
    assert dset["embeddings"].shape[0] == 30
    it = make_batch_iterator(Opt(data_type="synthetic"), dset,
                             batch_size=2)
    bm = next(it.get_iterator(random_seed=0))
    assert bm["sentences"].ndim == 2
    assert "neg_samples" in bm


def test_indexify_unk():
    w2i = {"a": 0, "b": 1, "_": 2}
    assert indexify([["a", "zz"]], w2i, 2) == [[0, 2]]
    with pytest.raises(ValueError):
        indexify([["zz"]], {"a": 0}, None)


def test_bucket_sizes_cli_expansion():
    """--bucket_sizes 'edge:B' expands to every exact length in the
    bucket (one compiled (B, L) program per bucket), leaves other
    buckets at the default batch size, errors on non-bucket edges, and
    lets explicit --length_to_size entries win."""
    sents = [[f"w{j}" for j in range(n)]
             for n in (3, 3, 3, 3, 5, 5, 5, 5, 8, 8, 8, 8)]
    vocab = sorted({w for s in sents for w in s})
    dset = {"sentences": [[i % len(vocab) for i in range(len(s))]
                          for s in sents],
            "word2idx": {w: i for i, w in enumerate(vocab)},
            "extra": {}}
    opt = Opt(length_buckets="5,8", bucket_sizes="5:4")
    it = make_batch_iterator(opt, dset, batch_size=2)
    sizes = {}
    for bm in it.get_iterator(random_seed=0):
        sizes.setdefault(bm["padded_length"], set()).add(bm["batch_size"])
    # lengths 3 and 5 share the L<=5 bucket: both upsized to 4
    assert sizes[5] == {4}
    assert sizes[8] == {2}

    # explicit length_to_size wins over the bucket expansion
    it = make_batch_iterator(Opt(length_buckets="5,8", bucket_sizes="5:4"),
                             dset, batch_size=2, length_to_size={3: 2})
    sizes = {}
    for bm in it.get_iterator(random_seed=0):
        sizes.setdefault(bm["padded_length"], set()).add(bm["batch_size"])
    assert sizes[5] == {2, 4}   # len-3 batches stay at 2, len-5 at 4

    with pytest.raises(ValueError, match="non-bucket edges"):
        make_batch_iterator(Opt(length_buckets="5,8", bucket_sizes="6:4"),
                            dset, batch_size=2)


def test_include_partial_cli_plumbing():
    """--include_partial/--pad_batches reach the TRAIN iterator: with
    --mixed_buckets every sentence trains (full-coverage production
    mode); default drops the final sub-B remainder per bucket
    (reference semantics, cliora/data/dataloader.py)."""
    from cliora_tpu.scripts.common import get_train_iterator
    from cliora_tpu.utils.flags import argument_parser, parse_args

    sents = [[i % 7 for i in range(n)]
             for n in ([5] * 9 + [6] * 4 + [9] * 6)]
    dset = {"sentences": sents,
            "word2idx": {f"w{i}": i for i in range(7)},
            "extra": {}}

    def cover(extra_flags):
        opt = parse_args(argument_parser(),
                         ["--batch_size", "4", "--n_length_buckets", "2",
                          "--mixed_buckets", "--emb", "none"]
                         + extra_flags)
        it = get_train_iterator(opt, dset)
        real = n_rows = 0
        for bm in it.get_iterator(random_seed=0):
            real += int(bm.get("real_size", bm["batch_size"]))
            n_rows = max(n_rows, len(bm["sentences"]))
        return real, n_rows

    dropped, _ = cover([])
    full, rows = cover(["--include_partial", "--pad_batches"])
    assert dropped < len(sents)       # reference default drops remainders
    assert full == len(sents)         # full coverage
    assert rows == 4                  # padded to batch_size: no new shapes
