"""End-to-end CLI: train 1 epoch on a tiny on-disk flickr-format corpus
(with MAF HDF5 features), checkpoint, then parse/eval from the
checkpoint -- the full reference workflow
(train_cliora.sh -> test_cliora.sh) in miniature."""

import glob
import json
import os
import pickle

import numpy as np
import pytest


def _write_corpus(root, rs, split, n_sentences, vocab_words, with_anno):
    lines, ids = [], []
    for i in range(n_sentences):
        n = rs.randint(3, 7)
        words = [vocab_words[rs.randint(2, len(vocab_words))]
                 for _ in range(n)]
        # right-branching gold spans (inclusive), root last
        gold = [(j, n - 1) for j in range(n - 2, 0, -1)] + [(0, n - 1)]
        lines.append([" ".join(words), gold])
        ids.append(f"{100 + i}\t0")
    with open(os.path.join(root, f"flickr_{split}.json"), "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
    with open(os.path.join(root, f"{split}.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    if with_anno:
        anno = {}
        for i in range(n_sentences):
            anno[f"{100 + i}_0"] = [
                {"phr0": (0, 2, [0.0, 0.0, 10.0, 10.0])}, [1, 1]]
        with open(os.path.join(root, f"gt_anno_{split}.pkl"), "wb") as f:
            pickle.dump(anno, f)
    return [100 + i for i in range(n_sentences)]


def _write_features(root, img_ids, mode, rs):
    import h5py

    n = len(img_ids)
    feats = rs.randn(n * 3, 64).astype(np.float32)
    boxes = np.tile(np.asarray([[0, 0, 10, 10], [5, 5, 20, 20],
                                [1, 1, 2, 2]], np.float32), (n, 1))
    pos = np.stack([np.arange(n) * 3, np.arange(n) * 3 + 3], axis=1)
    with h5py.File(os.path.join(root, f"{mode}_features_compress.hdf5"),
                   "w") as f:
        f.create_dataset("features", data=feats)
        f.create_dataset("bboxes", data=boxes)
        f.create_dataset("pos_bboxes", data=pos)
    with open(os.path.join(root, f"{mode}_imgid2idx.pkl"), "wb") as f:
        pickle.dump({img: i for i, img in enumerate(img_ids)}, f)
    det = {str(img): {"classes": ["cat", "dog", "cat"]} for img in img_ids}
    with open(os.path.join(root, f"{mode}_detection_dict.json"), "w") as f:
        json.dump(det, f)
    with open(os.path.join(root, "objects_vocab.txt"), "w") as f:
        f.write("cat\ndog\n")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("flickr"))
    rs = np.random.RandomState(0)
    words = ["_PAD", "<unk>", "a", "dog", "cat", "runs", "fast", "the",
             "big", "red", "sits", "jumps"]
    vocab = {w: i for i, w in enumerate(words)}
    with open(os.path.join(root, "flickr.dic.json"), "w") as f:
        json.dump(vocab, f)
    train_ids = _write_corpus(root, rs, "train", 24, words, False)
    test_ids = _write_corpus(root, rs, "test", 8, words, True)
    _write_features(root, train_ids, "train", rs)
    _write_features(root, test_ids, "test", rs)
    return root


def _common_args(corpus, exp_path):
    return [
        "--data_type", "flickr", "--emb", "none",
        "--train_path", os.path.join(corpus, "flickr_train.json"),
        "--validation_path", os.path.join(corpus, "flickr_test.json"),
        "--data_path", corpus + "/",
        "--experiment_path", exp_path,
        "--hidden_dim", "16", "--k_neg", "4", "--batch_size", "8",
        "--validation_batch_size", "4",
        "--obj_feats", "--vg_loss", "--use_contr",
        "--lr", "1e-3", "--seed", "3",
    ]


def test_train_and_parse_cli(corpus, tmp_path, monkeypatch):
    # FlickrDataset features here are 64-d, not 2048-d
    from cliora_tpu.scripts import parse as parse_script
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options
    import cliora_tpu.scripts.common as common_mod

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        import dataclasses
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    exp = str(tmp_path / "exp")
    train_script.main(_common_args(corpus, exp) + ["--max_epoch", "1"])

    ckpts = sorted(glob.glob(os.path.join(exp, "model.epoch_*.npz")))
    assert ckpts, os.listdir(exp)
    assert os.path.exists(os.path.join(exp, "flags.json"))
    assert os.path.exists(os.path.join(exp, "experiment.epoch_0.json"))
    # torch-interop twin written alongside
    assert os.path.exists(ckpts[0].replace(".npz", ".pt"))

    exp2 = str(tmp_path / "exp_parse")
    metrics = parse_script.main(
        _common_args(corpus, exp2)
        + ["--load_model_path", ckpts[0], "--postprocess"])

    assert 0.0 <= metrics["corpus_f1"] <= 1.0
    assert 0.0 <= metrics["grounding_acc"] <= 1.0
    out = os.path.join(exp2, "parse.jsonl")
    with open(out) as f:
        records = [json.loads(line) for line in f]
    assert len(records) == 8
    for r in records:
        assert set(r) >= {"example_id", "tree", "sentence", "gold_spans",
                          "pred_spans", "pred_boxes"}
        assert len(r["pred_boxes"]) == len(r["pred_spans"])


def test_steps_per_call_cli(corpus, tmp_path, monkeypatch):
    """--steps_per_call groups same-shape batches into one dispatch;
    the epoch must complete and checkpoint exactly as per-step does."""
    import dataclasses
    import cliora_tpu.scripts.common as common_mod
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    exp = str(tmp_path / "exp_spc")
    train_script.main(_common_args(corpus, exp)
                      + ["--max_epoch", "1", "--steps_per_call", "2"])
    assert os.path.exists(os.path.join(exp, "model.epoch_0.npz"))


def test_tensor_parallel_cli(corpus, tmp_path, monkeypatch):
    """--mp 2 arranges the 8 virtual devices as a (4, 2) mesh with
    Megatron-sharded weights (parallel/sharding.py); the epoch must
    train, eval and checkpoint like the pure-dp run."""
    import dataclasses
    import cliora_tpu.scripts.common as common_mod
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    exp = str(tmp_path / "exp_mp")
    train_script.main(_common_args(corpus, exp)
                      + ["--max_epoch", "1", "--mp", "2"])
    assert os.path.exists(os.path.join(exp, "model.epoch_0.npz"))


def test_max_step_with_steps_per_call_cli(corpus, tmp_path, monkeypatch):
    """--max_step must not be overshot by a full K-step group: the final
    dispatch is truncated to the remaining budget."""
    import dataclasses
    import cliora_tpu.scripts.common as common_mod
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options
    from cliora_tpu.training import trainer as trainer_mod

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    group_sizes = []
    orig_steps = trainer_mod.Trainer.steps

    def spy_steps(self, batch_maps):
        group_sizes.append(len(batch_maps))
        return orig_steps(self, batch_maps)

    monkeypatch.setattr(trainer_mod.Trainer, "steps", spy_steps)

    exp = str(tmp_path / "exp_maxstep")
    train_script.main(_common_args(corpus, exp)
                      + ["--max_epoch", "3", "--max_step", "3",
                         "--steps_per_call", "2"])
    assert sum(group_sizes) == 3, group_sizes   # exactly max_step updates
    with open(os.path.join(exp, "experiment.epoch_0.json")) as f:
        assert json.load(f)["step"] <= 3


def test_plain_text_train_cli(tmp_path):
    """--data_type txt has no gold spans: the epoch eval must report
    losses-only zeros instead of crashing on the missing GT."""
    import numpy as np
    from cliora_tpu.scripts import train as train_script

    rs = np.random.RandomState(0)
    words = [f"w{i}" for i in range(30)]
    for split in ("train", "test"):
        with open(tmp_path / f"{split}.txt", "w") as f:
            for _ in range(16):
                f.write(" ".join(
                    words[rs.randint(0, 30)] for _ in range(6)) + "\n")
    exp = str(tmp_path / "exp_txt")
    train_script.main([
        "--data_type", "txt", "--emb", "none",
        "--train_path", str(tmp_path / "train.txt"),
        "--validation_path", str(tmp_path / "test.txt"),
        "--experiment_path", exp, "--hidden_dim", "16", "--k_neg", "4",
        "--batch_size", "8", "--validation_batch_size", "8",
        "--lr", "1e-3", "--max_epoch", "1"])
    assert os.path.exists(os.path.join(exp, "model.epoch_0.npz"))


def test_keep_best_checkpoint_cli(corpus, tmp_path, monkeypatch):
    """model.best.npz must track the epoch with the best corpus_f1, not
    the last epoch (F1 oscillates late in training -- BASELINE.md)."""
    import dataclasses
    import cliora_tpu.scripts.common as common_mod
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    # scripted eval: epoch 1 is the best, last epoch is worse
    f1s = iter([0.3, 0.9, 0.5])

    def fake_eval(trainer, iterator, seed=11, use_obj=False):
        f1 = next(f1s)
        return {"corpus_f1": f1, "sent_f1": f1, "grounding_acc": 0.0}

    monkeypatch.setattr(train_script, "run_eval", fake_eval)

    exp = str(tmp_path / "exp_best")
    train_script.main(_common_args(corpus, exp) + ["--max_epoch", "3"])

    best = os.path.join(exp, "model.best.npz")
    assert os.path.exists(best)
    assert os.path.exists(os.path.join(exp, "model.best.pt"))
    with np.load(best) as z:
        assert int(z["__extra__/epoch"]) == 1
        assert float(z["__extra__/corpus_f1"]) == pytest.approx(0.9)
        # content identical to the epoch-1 per-epoch checkpoint
        with np.load(os.path.join(exp, "model.epoch_1.npz")) as z1:
            for k in z1.files:
                np.testing.assert_array_equal(z[k], z1[k])


def test_profile_steps_closes_trace(corpus, tmp_path, monkeypatch):
    """--profile_steps larger than the run's step count must still close
    the trace at exit (round-2 review: the stop condition never fired if
    the epoch or --max_step ended first)."""
    import dataclasses
    import cliora_tpu.scripts.common as common_mod
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    calls = {"start": 0, "stop": 0}
    import jax

    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda *a, **k: calls.__setitem__(
                            "start", calls["start"] + 1))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.__setitem__("stop", calls["stop"] + 1))

    exp = str(tmp_path / "exp_prof")
    train_script.main(_common_args(corpus, exp)
                      + ["--max_epoch", "1", "--max_step", "2",
                         "--profile_steps", "100"])
    assert calls == {"start": 1, "stop": 1}


def test_right_branch_cli(corpus, tmp_path):
    from cliora_tpu.scripts import right_branch

    f1 = right_branch.main([
        "--data_type", "flickr", "--emb", "none",
        "--validation_path", os.path.join(corpus, "flickr_test.json"),
        "--experiment_path", str(tmp_path / "rb"),
        "--validation_batch_size", "4", "--seed", "3",
    ])
    # gold spans are right-branching here, so recall-style F1 is high
    assert f1 > 0.9


def test_resume_cli(corpus, tmp_path, monkeypatch):
    """--resume restores params + optimizer state and keeps training."""
    import dataclasses
    import cliora_tpu.scripts.common as common_mod
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    exp = str(tmp_path / "exp_resume")
    args = _common_args(corpus, exp) + ["--attn_impl", "chunked"]
    train_script.main(args + ["--max_epoch", "1"])
    ckpt = os.path.join(exp, "model.epoch_0.npz")
    assert os.path.exists(ckpt)
    assert os.path.exists(ckpt.replace(".npz", ".opt.pkl"))

    exp2 = str(tmp_path / "exp_resumed")
    train_script.main(
        _common_args(corpus, exp2)
        + ["--attn_impl", "chunked", "--max_epoch", "2",
           "--resume", ckpt])
    # exact resume: epoch 0 is already done (the json next to the
    # checkpoint says so) -- only epoch 1 trains
    assert os.path.exists(os.path.join(exp2, "model.epoch_1.npz"))
    assert not os.path.exists(os.path.join(exp2, "model.epoch_0.npz"))


def test_diora_to_cliora_warmstart_cli(corpus, tmp_path, monkeypatch):
    """The reference's signature workflow: pretrain text-only DIORA,
    then finetune CLIORA from that checkpoint (train_diora.sh ->
    train_cliora.sh)."""
    import dataclasses
    import cliora_tpu.scripts.common as common_mod
    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.scripts.common import model_config_from_options

    def small_cfg(options, embeddings):
        cfg = model_config_from_options(options, embeddings)
        return dataclasses.replace(cfg, obj_feat_size=64, n_regions=3)

    monkeypatch.setattr(common_mod, "model_config_from_options", small_cfg)

    base = [
        "--data_type", "flickr", "--emb", "none",
        "--train_path", os.path.join(corpus, "flickr_train.json"),
        "--validation_path", os.path.join(corpus, "flickr_test.json"),
        "--data_path", corpus + "/",
        "--hidden_dim", "16", "--k_neg", "4", "--batch_size", "8",
        "--validation_batch_size", "4", "--seed", "3", "--max_epoch", "1",
    ]
    exp_diora = str(tmp_path / "exp_diora")
    train_script.main(base + ["--experiment_path", exp_diora])
    ckpt = os.path.join(exp_diora, "model.epoch_0.npz")
    assert os.path.exists(ckpt)

    exp_cliora = str(tmp_path / "exp_cliora")
    train_script.main(base + [
        "--experiment_path", exp_cliora,
        "--obj_feats", "--vg_loss", "--use_contr", "--lr", "1e-5",
        "--load_model_path", ckpt])
    assert os.path.exists(os.path.join(exp_cliora, "model.epoch_0.npz"))


def test_ckpt_keep_prunes_old_epochs(tmp_path, rng):
    """--ckpt_keep 2: only the newest two per-epoch checkpoints survive;
    model.best.* is never pruned."""
    from cliora_tpu.scripts import train as train_script

    root = tmp_path / "corpus"
    root.mkdir()
    words = [f"w{i}" for i in range(30)]
    with open(root / "train.txt", "w") as f:
        for _ in range(16):
            f.write(" ".join(words[rng.randint(0, 30)]
                             for _ in range(6)) + "\n")
    exp = str(tmp_path / "exp_keep")
    train_script.main([
        "--data_type", "txt", "--emb", "none",
        "--train_path", str(root / "train.txt"),
        "--validation_path", str(root / "train.txt"),
        "--experiment_path", exp, "--hidden_dim", "16", "--k_neg", "4",
        "--batch_size", "8", "--validation_batch_size", "8",
        "--lr", "1e-3", "--max_epoch", "4", "--ckpt_keep", "2"])
    import glob as g
    left = sorted(g.glob(os.path.join(exp, "model.epoch_*.npz")))
    assert [os.path.basename(p) for p in left] == [
        "model.epoch_2.npz", "model.epoch_3.npz"], left
    assert not g.glob(os.path.join(exp, "model.epoch_0.*")), "epoch 0 kept"
    assert os.path.exists(os.path.join(exp, "model.best.npz"))
    # experiment jsons are never pruned
    assert os.path.exists(os.path.join(exp, "experiment.epoch_0.json"))


def _txt_corpus(tmp_path, rng, n=16):
    root = tmp_path / "corpus"
    root.mkdir()
    words = [f"w{i}" for i in range(30)]
    with open(root / "train.txt", "w") as f:
        for _ in range(n):
            f.write(" ".join(words[rng.randint(0, 30)]
                             for _ in range(rng.randint(4, 8))) + "\n")
    return root


def _txt_args(root, exp, max_epoch):
    return [
        "--data_type", "txt", "--emb", "none",
        "--train_path", str(root / "train.txt"),
        "--validation_path", str(root / "train.txt"),
        "--experiment_path", exp, "--hidden_dim", "16", "--k_neg", "4",
        "--batch_size", "8", "--validation_batch_size", "8",
        "--lr", "1e-3", "--max_epoch", str(max_epoch)]


def test_resume_auto_cli(tmp_path, rng):
    """--resume auto: cold start trains fresh; a preemption restart
    continues AT THE NEXT EPOCH (completed epochs are never re-run);
    rerunning a finished job is a no-op."""
    from cliora_tpu.scripts import train as train_script

    root = _txt_corpus(tmp_path, rng)
    exp = str(tmp_path / "exp_auto")
    args = _txt_args(root, exp, 2) + ["--resume", "auto"]
    train_script.main(args)          # cold start: no checkpoint yet
    assert os.path.exists(os.path.join(exp, "model.epoch_1.npz"))
    mtime0 = os.path.getmtime(os.path.join(exp, "model.epoch_0.npz"))
    mtime1 = os.path.getmtime(os.path.join(exp, "model.epoch_1.npz"))

    train_script.main(args)          # finished job: nothing to do
    assert os.path.getmtime(
        os.path.join(exp, "model.epoch_0.npz")) == mtime0
    assert os.path.getmtime(
        os.path.join(exp, "model.epoch_1.npz")) == mtime1
    assert not os.path.exists(os.path.join(exp, "model.epoch_2.npz"))

    # "preemption" restart with a longer schedule: trains ONLY epoch 2
    train_script.main(_txt_args(root, exp, 3) + ["--resume", "auto"])
    assert os.path.exists(os.path.join(exp, "model.epoch_2.npz"))
    assert os.path.getmtime(
        os.path.join(exp, "model.epoch_0.npz")) == mtime0


def test_exact_resume_reproduces_uninterrupted_run(tmp_path, rng):
    """Resume-at-epoch-k fidelity: 2 epochs + resume for a 3rd produces
    the SAME final checkpoint as 3 uninterrupted epochs -- batch order,
    negative draws, and the step-rng stream all continue exactly
    (the reference's warm-start "resume" restores none of these,
    cliora/utils/checkpoint.py:4-8)."""
    from cliora_tpu.scripts import train as train_script

    root = _txt_corpus(tmp_path, rng)

    exp_full = str(tmp_path / "exp_full")
    train_script.main(_txt_args(root, exp_full, 3))

    exp_res = str(tmp_path / "exp_res")
    train_script.main(_txt_args(root, exp_res, 2))
    train_script.main(_txt_args(root, exp_res, 3) + ["--resume", "auto"])

    a = np.load(os.path.join(exp_full, "model.epoch_2.npz"))
    b = np.load(os.path.join(exp_res, "model.epoch_2.npz"))
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # the snapshot json carries the full resume state
    with open(os.path.join(exp_res, "experiment.epoch_2.json")) as f:
        snap = json.load(f)
    assert {"step", "epoch", "host_step", "seed"} <= set(snap)


def test_eval_buckets_cli(corpus, tmp_path, monkeypatch):
    """--eval_buckets pads validation batches to the TRAIN bucket edges
    (one parse compile per bucket) and reports identical metrics."""
    from cliora_tpu.scripts import train as train_script

    root = corpus
    common = [
        "--data_type", "flickr", "--emb", "none",
        "--train_path", os.path.join(root, "flickr_train.json"),
        "--validation_path", os.path.join(root, "flickr_test.json"),
        "--data_path", root, "--hidden_dim", "16", "--k_neg", "4",
        "--batch_size", "8", "--validation_batch_size", "8",
        "--lr", "0", "--max_epoch", "1", "--seed", "11",
        "--n_length_buckets", "2"]

    metrics = {}
    real_eval = train_script.run_eval

    def record(name):
        def wrapped(trainer, iterator, **kw):
            lens = {bm.get("padded_length") or bm["length"]
                    for bm in iterator.get_iterator(random_seed=0)}
            metrics[name] = (real_eval(trainer, iterator, **kw), lens)
            return metrics[name][0]

        return wrapped

    monkeypatch.setattr(train_script, "run_eval", record("exact"))
    train_script.main(common + ["--experiment_path",
                                str(tmp_path / "exp_a")])
    monkeypatch.setattr(train_script, "run_eval", record("bucketed"))
    train_script.main(common + ["--eval_buckets", "--experiment_path",
                                str(tmp_path / "exp_b")])

    (m_exact, lens_exact), (m_bucket, lens_bucket) = (
        metrics["exact"], metrics["bucketed"])
    # bucketed eval runs every batch at a train bucket edge: at most
    # n_length_buckets distinct padded lengths, strictly fewer compiled
    # parse programs than the exact-length path
    assert len(lens_bucket) <= 2 < len(lens_exact)
    for k in ("corpus_f1", "sent_f1"):
        np.testing.assert_allclose(m_bucket[k], m_exact[k], atol=1e-9,
                                   err_msg=k)
