"""Multi-process rendezvous tests (reference: cliora/scripts/train.py:293-300
MASTER_ADDR/PORT env rendezvous; cliora/net/trainer.py:528-533 init_process_group).

The real-rendezvous test launches 2 fresh CPU subprocesses that meet at a
local coordinator and run one data-parallel step over the global 2-device
mesh -- the TPU-pod launch shape, minus the pod.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from cliora_tpu.parallel.multihost import (
    _already_initialized,
    initialize_multihost,
    is_chief,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_noop_single_process():
    # conftest already initialized the (single-process) backend; the
    # single-process path must not try to initialize jax.distributed.
    assert not _already_initialized()
    initialize_multihost()  # no args, no env -> no-op
    initialize_multihost(num_processes=1)  # explicit 1 -> no-op
    assert not _already_initialized()
    assert is_chief()


def test_noop_ignores_unrelated_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")  # nproc without coord
    initialize_multihost()
    assert not _already_initialized()


_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from cliora_tpu.parallel.multihost import initialize_multihost, is_chief

    pid = int(sys.argv[1])
    initialize_multihost(coordinator_address={coord!r},
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert is_chief() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # global 2-device mesh (1 CPU device per process); each process feeds
    # its local shard of the global batch -- the multi-host dp contract.
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    local = np.full((2, 3), float(pid + 1), np.float32)
    global_shape = (4, 3)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local, global_shape)
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    # 2*3 ones + 2*3 twos = 18 -- proves the cross-process reduce ran.
    np.testing.assert_allclose(np.asarray(total), 18.0)
    print("WORKER_OK", pid)
""")


@pytest.mark.slow
def test_two_process_rendezvous(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO, coord=coord))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 device per process, not 8
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out


_EPOCH_WORKER = textwrap.dedent("""
    import glob, json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    pid = int(sys.argv[1])
    corpus = {corpus!r}
    out = {out!r}

    from cliora_tpu.scripts import train as train_script

    base = [
        "--data_type", "flickr", "--emb", "none",
        "--train_path", os.path.join(corpus, "flickr_train.json"),
        "--validation_path", os.path.join(corpus, "flickr_test.json"),
        "--hidden_dim", "16", "--k_neg", "4", "--batch_size", "8",
        "--validation_batch_size", "4", "--lr", "1e-3", "--seed", "3",
        "--master_addr", "127.0.0.1", "--master_port", {port!r},
        "--world_size", "2", "--local_rank", str(pid),
        # ZeRO-1 under a true multi-process mesh: dp-sharded Adam
        # state through train -> eval -> checkpoint (allgather
        # materialization) -> resume (zero1 re-placement)
        "--zero1",
    ]
    exp1 = os.path.join(out, "exp1")
    train_script.main(base + ["--experiment_path", exp1,
                              "--max_epoch", "2"])
    assert jax.process_count() == 2

    ckpt = os.path.join(exp1, "model.epoch_1.npz")
    best = os.path.join(exp1, "model.best.npz")
    if pid == 0:
        # chief-only artifacts: per-epoch + keep-best checkpoints, opt
        # state, experiment json (both processes share the fs, so only
        # existence on the chief is checkable)
        for p in (ckpt, best, ckpt.replace(".npz", ".opt.pkl"),
                  os.path.join(exp1, "experiment.epoch_1.json")):
            assert os.path.exists(p), p

    # resume from the chief's checkpoint on BOTH processes (shared fs)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ckpt-ready")
    exp2 = os.path.join(out, "exp2")
    train_script.main(base + ["--experiment_path", exp2,
                              "--max_epoch", "1", "--resume", ckpt])
    if pid == 0:
        assert os.path.exists(os.path.join(exp2, "model.epoch_0.npz"))
    print("WORKER_OK", pid)
""")


@pytest.mark.slow
def test_two_process_full_epoch(tmp_path):
    """Full multi-process workflow: 2 processes meet at a coordinator,
    train 2 epochs over the global 2-device dp mesh (per-process batch
    chunks assembled into global arrays), the chief evals + checkpoints
    (incl. keep-best), then both resume from the chief's checkpoint.

    This is the leg the round-2 review flagged: replicated params under a
    multi-process mesh are not fully addressable, so eval/checkpoint must
    materialize process-local replicas (Trainer.local_params)."""
    import json

    import pickle

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    words = ["_PAD", "<unk>", "a", "dog", "cat", "runs", "fast", "the",
             "big", "red"]
    rs = np.random.RandomState(0)
    for split, n_sent in (("train", 32), ("test", 8)):
        lines, ids = [], []
        for i in range(n_sent):
            n = 5  # fixed length -> full batches of 8 guaranteed
            sent = " ".join(words[rs.randint(2, len(words))]
                            for _ in range(n))
            gold = [(j, n - 1) for j in range(n - 2, 0, -1)] + [(0, n - 1)]
            lines.append(json.dumps([sent, gold]))
            ids.append(f"{100 + i}\t0")
        (corpus / f"flickr_{split}.json").write_text("\n".join(lines))
        (corpus / f"{split}.txt").write_text("\n".join(ids))
        if split == "test":
            anno = {f"{100 + i}_0": [
                {"phr0": (0, 2, [0.0, 0.0, 10.0, 10.0])}, [1, 1]]
                for i in range(n_sent)}
            with open(corpus / f"gt_anno_{split}.pkl", "wb") as f:
                pickle.dump(anno, f)
    (corpus / "flickr.dic.json").write_text(
        json.dumps({w: i for i, w in enumerate(words)}))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_EPOCH_WORKER.format(
        repo=REPO, corpus=str(corpus), out=str(tmp_path),
        port=str(port)))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 device per process
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out


def test_env_topology_forwarded(monkeypatch):
    """JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID must be passed
    through explicitly: jax.distributed.initialize only auto-detects the
    coordinator, and dies with 'Number of processes must be defined'
    otherwise."""
    import jax

    captured = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None, **kw):
        captured.update(coordinator_address=coordinator_address,
                        num_processes=num_processes,
                        process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    initialize_multihost()
    assert captured == {"coordinator_address": "10.0.0.1:1234",
                        "num_processes": 4, "process_id": 2}

    # explicit args win over env
    captured.clear()
    initialize_multihost("host:9", 2, 1)
    assert captured == {"coordinator_address": "host:9",
                        "num_processes": 2, "process_id": 1}


def test_incomplete_topology_error_is_clear(monkeypatch):
    """A partial topology is still forwarded (cluster auto-detection may
    fill it in); only if initialize fails is the opaque backend error
    chained under a message naming the missing pieces (advisor finding,
    round 2 + round 3)."""
    import jax

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)

    # auto-detecting platform: incomplete args succeed, no raise
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: None)
    initialize_multihost("host:9", 4, None)

    # no auto-detection: backend failure surfaces with the clear message
    def failing_initialize(**kw):
        raise RuntimeError("Number of processes must be defined.")

    monkeypatch.setattr(jax.distributed, "initialize", failing_initialize)
    with pytest.raises(ValueError, match="JAX_PROCESS_ID"):
        initialize_multihost("host:9", 4, None)
    with pytest.raises(ValueError, match="JAX_COORDINATOR_ADDRESS"):
        initialize_multihost(None, 4, 0)
    # complete topology that still fails: original error propagates
    with pytest.raises(RuntimeError, match="Number of processes"):
        initialize_multihost("host:9", 4, 1)


_STEPS_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    import numpy as np
    from cliora_tpu.parallel.multihost import initialize_multihost

    pid = int(sys.argv[1])
    initialize_multihost(coordinator_address={coord!r},
                         num_processes=2, process_id=pid)

    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.parallel.mesh import make_mesh
    from cliora_tpu.training.trainer import TrainConfig, Trainer, \\
        _local_value

    # text-only: the zero-init image encoder's roundoff-scale grads get
    # Adam-amplified to lr scale, so cross-program parity tests must
    # avoid the visual head (CLAUDE.md round-3 finding); dropout-free
    # (steps() and step() draw dropout keys differently by design)
    cfg = ModelConfig(size=16, input_size=24, attn_dropout=0.0)
    tc = TrainConfig(lr=1e-3, k_neg=4, emb_trainable=True)

    # per-process LOCAL batch chunks (4 rows each; global B=8), identical
    # streams on both processes modulo the chunk
    rs = np.random.RandomState(7)
    K = 4
    batches = []
    for _ in range(K):
        glob = {{
            "sentences": rs.randint(2, 100, (8, 6)),
            "neg_samples": rs.choice(100, 4, replace=False),
        }}
        batches.append({{
            "sentences": glob["sentences"][4 * pid:4 * pid + 4],
            "neg_samples": glob["neg_samples"],
        }})

    mesh = make_mesh(2)
    t1 = Trainer.build(cfg, tc, 100, seed=0, mesh=mesh)
    # metrics are replicated global arrays (not fully addressable per
    # process): take this process's replica before float()
    seq = [jax.tree.map(_local_value, dict(t1.step(bm)))
           for bm in batches]

    t2 = Trainer.build(cfg, tc, 100, seed=0, mesh=mesh)
    grouped = t2.steps(batches)    # --steps_per_call 4, one dispatch

    assert len(grouped) == K
    for a, b in zip(seq, grouped):
        for k in a:
            np.testing.assert_allclose(float(a[k]), float(b[k]),
                                       rtol=1e-5, err_msg=k)
    for pa, pb in zip(jax.tree.leaves(t1.local_params()),
                      jax.tree.leaves(t2.local_params())):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6)

    # distributed eval parity (VERDICT r3 item 7): run_eval shards the
    # validation batches round-robin over the 2 processes and allreduces
    # the F1 counters -- metrics must equal a full single-pass eval.
    from cliora_tpu.analysis.eval import run_eval
    from cliora_tpu.analysis.trees import F1Meter
    from cliora_tpu.analysis.eval import eval_batch_trees

    ev = []
    for _ in range(5):   # odd count: processes get unequal shares
        sents = rs.randint(2, 100, (4, 6))
        gold = [[(0, 2), (3, 5), (0, 5)] for _ in range(4)]
        ev.append({{"sentences": sents, "batch_size": 4, "length": 6,
                    "neg_samples": rs.choice(100, 4, replace=False),
                    "GT": gold}})

    class It:
        def get_iterator(self, random_seed=None):
            return iter(ev)

    got = run_eval(t1, It(), use_obj=False)

    # reference: full-set chief-style pass on this process alone
    f1 = F1Meter()
    for bm in ev:
        res, _ = t1.parse(bm, compute_loss=False, outside=False)
        for bid, (_t, pred) in enumerate(
                eval_batch_trees(res["cky_bp"], 6)):
            f1.update(pred, set(bm["GT"][bid][:-1]))
    np.testing.assert_allclose(got["corpus_f1"], f1.corpus_f1)
    np.testing.assert_allclose(got["sent_f1"], f1.sent_f1)
    print("WORKER_OK", pid)
""")


@pytest.mark.slow
def test_two_process_steps_per_call(tmp_path):
    """Trainer.steps under a true 2-process global mesh (VERDICT r3
    item 4): K local batch chunks are assembled into dp-sharded global
    arrays, stacked INSIDE the jitted program, and the K-step scan
    matches K sequential step() dispatches -- per-step metrics and final
    params identical."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_STEPS_WORKER.format(repo=REPO, coord=coord))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 device per process
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out


_ORBAX_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    pid = int(sys.argv[1])
    corpus = {corpus!r}
    out = {out!r}

    from cliora_tpu.scripts import train as train_script
    from cliora_tpu.training.orbax_ckpt import is_orbax_dir

    base = [
        "--data_type", "flickr", "--emb", "none",
        "--train_path", os.path.join(corpus, "flickr_train.json"),
        "--validation_path", os.path.join(corpus, "flickr_test.json"),
        "--hidden_dim", "16", "--k_neg", "4", "--batch_size", "8",
        "--validation_batch_size", "4", "--lr", "1e-3", "--seed", "3",
        "--master_addr", "127.0.0.1", "--master_port", {port!r},
        "--world_size", "2", "--local_rank", str(pid),
        "--ckpt_backend", "orbax",
    ]
    exp1 = os.path.join(out, "exp1")
    train_script.main(base + ["--experiment_path", exp1,
                              "--max_epoch", "1"])
    ckpt = os.path.join(exp1, "model.epoch_0.orbax")
    # the collective write is finalized before exit (AsyncSaver.close in
    # run_train's finally); both processes see the committed dir
    assert is_orbax_dir(ckpt), os.listdir(exp1)
    if pid == 0:
        assert os.path.exists(os.path.join(exp1, "model.best.npz"))

    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ckpt-ready")
    exp2 = os.path.join(out, "exp2")
    train_script.main(base + ["--experiment_path", exp2,
                              "--max_epoch", "1", "--resume", ckpt])
    assert is_orbax_dir(os.path.join(exp2, "model.epoch_0.orbax"))
    print("WORKER_OK", pid)
""")


@pytest.mark.slow
def test_two_process_orbax_epoch(tmp_path):
    """--ckpt_backend orbax under a 2-process global mesh: the per-epoch
    save is a COLLECTIVE sharded write (both processes participate,
    scripts/train.py calls it outside the chief gate), and --resume
    restores the state with the run's shardings on both processes."""
    import json
    import pickle

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    words = ["_PAD", "<unk>", "a", "dog", "cat", "runs", "fast", "the"]
    rs = np.random.RandomState(0)
    for split, n_sent in (("train", 32), ("test", 8)):
        lines, ids = [], []
        for i in range(n_sent):
            n = 5
            sent = " ".join(words[rs.randint(2, len(words))]
                            for _ in range(n))
            gold = [(j, n - 1) for j in range(n - 2, 0, -1)] + [(0, n - 1)]
            lines.append(json.dumps([sent, gold]))
            ids.append(f"{100 + i}\t0")
        (corpus / f"flickr_{split}.json").write_text("\n".join(lines))
        (corpus / f"{split}.txt").write_text("\n".join(ids))
        if split == "test":
            anno = {f"{100 + i}_0": [
                {"phr0": (0, 2, [0.0, 0.0, 10.0, 10.0])}, [1, 1]]
                for i in range(n_sent)}
            with open(corpus / f"gt_anno_{split}.pkl", "wb") as f:
                pickle.dump(anno, f)
    (corpus / "flickr.dic.json").write_text(
        json.dumps({w: i for i, w in enumerate(words)}))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_ORBAX_WORKER.format(
        repo=REPO, corpus=str(corpus), out=str(tmp_path),
        port=str(port)))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 device per process
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out
