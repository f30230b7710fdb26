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
