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

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed init.

    No-op for single-process runs (the common case here) and when
    already initialized.
    """
    if jax.process_count() > 1:
        return  # already initialized by the environment
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process; nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def is_chief() -> bool:
    return jax.process_index() == 0
