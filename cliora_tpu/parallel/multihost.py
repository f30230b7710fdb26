"""Multi-host (multi-process) initialization.

The reference's multi-GPU launch is ``torch.distributed.launch`` +
NCCL rendezvous via MASTER_ADDR/PORT env vars (reference:
cliora/net/trainer.py:528-533, cliora/scripts/train.py:293-300).  The
TPU-native equivalent is ``jax.distributed.initialize``: on TPU pods the
coordinator/process topology comes from the TPU environment
automatically; elsewhere (or to force it) pass the flags through.

After initialization, the dp mesh (parallel/mesh.py) spans all global
devices, each host feeds its per-process batch shard
(data/batching.py process_index/process_count), and checkpoints/eval run
on process 0 only (scripts/train.py run_train).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _already_initialized() -> bool:
    """Whether jax.distributed.initialize has already run.

    Checks the distributed client state directly: reading
    ``jax.process_count()`` would *initialize the backend*, after which
    ``jax.distributed.initialize`` raises -- the exact ordering trap this
    module must avoid (reference's equivalent guard:
    cliora/net/trainer.py:528-533 checks args.multigpu before init).
    """
    from jax._src import distributed

    return distributed.global_state.client is not None


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed init (call BEFORE any jax.devices()).

    The decision to initialize is made purely from the explicit args and
    the standard env vars (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES, set
    by TPU-pod launchers), never by querying the backend: touching
    ``jax.process_count()`` first would initialize the single-process
    backend and make the subsequent initialize() fail.

    No-op for single-process runs (the common case here) and when
    already initialized.
    """
    if _already_initialized():
        return
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_nproc = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    multiprocess = (
        coordinator_address is not None
        or num_processes not in (None, 1)
        or (env_coord is not None and env_nproc not in (None, "1")))
    if not multiprocess:
        return  # single process; nothing to do
    # jax.distributed.initialize only auto-detects the coordinator from
    # env, not the process topology -- forward the env values explicitly
    # or an env-driven launch dies with "Number of processes must be
    # defined."
    if coordinator_address is None:
        coordinator_address = env_coord
    if num_processes is None and env_nproc is not None:
        num_processes = int(env_nproc)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    # An incomplete topology is still forwarded: platforms with cluster
    # auto-detection (Cloud TPU pods, GKE) fill in missing pieces
    # themselves.  Only if initialize *fails* is the opaque backend error
    # chained under a clear message naming what was missing (advisor
    # finding, round 2).
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except Exception as e:
        missing = []
        if coordinator_address is None:
            missing.append("coordinator_address / JAX_COORDINATOR_ADDRESS")
        if num_processes is not None and num_processes > 1 \
                and process_id is None:
            missing.append("process_id / JAX_PROCESS_ID")
        if missing:
            raise ValueError(
                "multi-process init failed; the environment does not "
                "auto-detect the cluster topology and these were not "
                "provided: " + ", ".join(missing)) from e
        raise


def is_chief() -> bool:
    return jax.process_index() == 0
