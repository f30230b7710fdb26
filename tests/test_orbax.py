"""Orbax sharded/async checkpoint backend (training/orbax_ckpt.py).

Save the full TrainState straight from device shards on the virtual
8-device mesh (including Megatron ``--mp`` sharded params), restore it
with the trainer's shardings, and verify the resumed trajectory is
bit-identical to the uninterrupted one.
"""

import os

import jax
import numpy as np
import pytest

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.parallel.mesh import make_mesh
from cliora_tpu.training.checkpoint import flatten
from cliora_tpu.training.orbax_ckpt import (
    AsyncSaver,
    is_orbax_dir,
    restore_state,
    save_state,
)
from cliora_tpu.training.trainer import TrainConfig, Trainer

D, E, V = 16, 24, 50


def _batch(rs, B=16, L=6):
    return {
        "sentences": rs.randint(2, V, (B, L)),
        "neg_samples": rs.choice(V, 5, replace=False),
    }


def _trainer(mesh=None):
    cfg = ModelConfig(size=D, input_size=E)
    tc = TrainConfig(lr=1e-3, k_neg=5, emb_trainable=True)
    return Trainer.build(cfg, tc, V, seed=0, mesh=mesh)


def _assert_state_equal(a, b):
    fa, fb = flatten(a.params), flatten(b.params)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)
    for la, lb in zip(jax.tree.leaves(a.opt_state),
                      jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert int(a.step) == int(b.step)


def test_roundtrip_single_device(rng, tmp_path):
    tr = _trainer()
    tr.step(_batch(rng), rng=jax.random.PRNGKey(0))
    path = str(tmp_path / "state.orbax")
    save_state(path, tr.state)
    assert is_orbax_dir(path)

    tr2 = _trainer()
    tr2.state = restore_state(path, tr2.state)
    _assert_state_equal(tr.state, tr2.state)


@pytest.mark.parametrize("mp", [1, 2])
def test_resume_trajectory_bit_identical(rng, tmp_path, mp):
    """save -> restore into a FRESH trainer -> next steps match the
    uninterrupted run exactly, on dp and (dp, mp) meshes."""
    mesh = make_mesh(8, mp=mp)
    batches = [_batch(rng) for _ in range(4)]
    keys = [jax.random.PRNGKey(i) for i in range(4)]

    tr = _trainer(mesh)
    for b, k in zip(batches[:2], keys[:2]):
        tr.step(b, rng=k)
    path = str(tmp_path / "mid.orbax")
    save_state(path, tr.state)

    tr2 = _trainer(make_mesh(8, mp=mp))
    tr2.state = restore_state(path, tr2.state)
    # restore places leaves with the template's shardings (spec may be
    # normalized without trailing Nones -- compare semantically)
    for a, b in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(tr2.state.params)):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim), \
            (a.sharding, b.sharding)

    for b, k in zip(batches[2:], keys[2:]):
        m1 = tr.step(b, rng=k)
        m2 = tr2.step(b, rng=k)
    np.testing.assert_array_equal(np.asarray(m1["total_loss"]),
                                  np.asarray(m2["total_loss"]))
    _assert_state_equal(tr.state, tr2.state)


def test_async_saver(rng, tmp_path):
    """AsyncSaver returns before the write finalizes; wait() + restore
    round-trips both checkpoints (wait-on-next-save discipline)."""
    tr = _trainer()
    states = []
    with AsyncSaver() as saver:
        for epoch in range(2):
            tr.step(_batch(rng), rng=jax.random.PRNGKey(epoch))
            saver.save(str(tmp_path / f"e{epoch}.orbax"), tr.state)
            states.append(tr.state)
        saver.wait()
        for epoch in range(2):
            tr2 = _trainer()
            tr2.state = restore_state(str(tmp_path / f"e{epoch}.orbax"),
                                      tr2.state)
            _assert_state_equal(states[epoch], tr2.state)


def test_is_orbax_dir_negatives(tmp_path):
    assert not is_orbax_dir(str(tmp_path))              # plain dir
    p = tmp_path / "model.npz"
    p.write_bytes(b"x")
    assert not is_orbax_dir(str(p))                     # a file


def test_cli_orbax_backend_and_resume(tmp_path):
    """--ckpt_backend orbax writes per-epoch orbax dirs (no npz), and
    --resume on such a dir restores params + optimizer state."""
    import json

    from cliora_tpu.scripts import train as train_script

    root = str(tmp_path / "corpus")
    os.makedirs(root)
    rs = np.random.RandomState(0)
    words = ["_PAD", "<unk>", "a", "dog", "cat", "runs", "fast", "the"]
    with open(os.path.join(root, "train.txt"), "w") as f:
        for _ in range(16):
            n = rs.randint(3, 7)
            f.write(" ".join(words[rs.randint(2, len(words))]
                             for _ in range(n)) + "\n")

    def args(exp):
        return [
            "--data_type", "txt", "--emb", "none",
            "--train_path", os.path.join(root, "train.txt"),
            "--validation_path", os.path.join(root, "train.txt"),
            "--experiment_path", exp,
            "--hidden_dim", "16", "--k_neg", "4", "--batch_size", "8",
            "--validation_batch_size", "4", "--lr", "1e-3", "--seed", "3",
            "--ckpt_backend", "orbax", "--max_epoch", "1",
        ]

    exp = str(tmp_path / "exp")
    train_script.main(args(exp))
    ckpt = os.path.join(exp, "model.epoch_0.orbax")
    assert is_orbax_dir(ckpt), os.listdir(exp)
    assert not os.path.exists(os.path.join(exp, "model.epoch_0.npz"))
    # keep-best interop artifacts still written by the chief
    assert os.path.exists(os.path.join(exp, "model.best.npz"))
    assert os.path.exists(os.path.join(exp, "experiment.epoch_0.json"))
    with open(os.path.join(exp, "flags.json")) as f:
        assert json.load(f)["ckpt_backend"] == "orbax"

    exp2 = str(tmp_path / "exp_resumed")
    train_script.main(args(exp2) + ["--resume", ckpt])
    assert is_orbax_dir(os.path.join(exp2, "model.epoch_0.orbax"))


def test_ckpt_keep_prunes_orbax_dirs(tmp_path):
    """--ckpt_keep prunes .orbax checkpoint DIRECTORIES too (the
    shutil.rmtree branch of _prune_checkpoints)."""
    from cliora_tpu.scripts import train as train_script

    root = tmp_path / "corpus"
    root.mkdir()
    rs = np.random.RandomState(0)
    words = [f"w{i}" for i in range(20)]
    with open(root / "train.txt", "w") as f:
        for _ in range(16):
            f.write(" ".join(words[rs.randint(0, 20)]
                             for _ in range(5)) + "\n")
    exp = str(tmp_path / "exp")
    train_script.main([
        "--data_type", "txt", "--emb", "none",
        "--train_path", str(root / "train.txt"),
        "--validation_path", str(root / "train.txt"),
        "--experiment_path", exp, "--hidden_dim", "16", "--k_neg", "4",
        "--batch_size", "8", "--validation_batch_size", "8",
        "--lr", "1e-3", "--max_epoch", "3",
        "--ckpt_backend", "orbax", "--ckpt_keep", "1"])
    assert not os.path.exists(os.path.join(exp, "model.epoch_0.orbax"))
    assert not os.path.exists(os.path.join(exp, "model.epoch_1.orbax"))
    assert is_orbax_dir(os.path.join(exp, "model.epoch_2.orbax"))
