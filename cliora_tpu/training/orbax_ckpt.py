"""Sharded, async checkpointing via Orbax -- the pod-scale backend.

The native ``.npz`` path (training/checkpoint.py) materializes the full
model on the host before writing: correct and simple for replicated
data-parallel states, but at pod scale it has two costs the reference
never had to face (its DDP ranks each own a full local model and rank 0
``torch.save``s it, cliora/net/trainer.py:383-398):

  * sharded params (``--mp`` tensor parallelism, or any future
    fully-sharded state) must be allgathered through host memory; and
  * the write blocks the epoch loop on the chief.

This backend writes each process's *addressable shards* in parallel
directly from device memory (a collective: **all** processes must call
``save``/``restore`` together) and optionally finalizes the write on a
background thread so the epoch's eval overlaps the I/O.  Restore places
every leaf with the template's sharding, so a resumed ``--mp`` run needs
no re-placement pass.

Orbax is the standard JAX ecosystem checkpointer; this module keeps the
repo's surface tiny (save / restore / an async saver with a
wait-on-next-save discipline) and leaves layout policy to it.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_state", "restore_state", "AsyncSaver", "is_orbax_dir"]


def _abspath(path: str) -> str:
    # orbax requires absolute paths
    return os.path.abspath(os.path.expanduser(path))


def is_orbax_dir(path: str) -> bool:
    """True if ``path`` looks like an orbax checkpoint directory."""
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(path, "_METADATA")))


def _abstract_like(tree: Any) -> Any:
    """ShapeDtypeStructs carrying the template's shardings.

    Restoring against this template yields arrays already placed on the
    template's mesh (replicated-dp or Megatron ``--mp`` specs alike).
    """
    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    return jax.tree.map(leaf, tree)


def save_state(path: str, state: Any, *, force: bool = True) -> None:
    """Blocking collective save of a pytree (e.g. a ``TrainState``)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abspath(path), state, force=force)


def restore_state(path: str, template: Any) -> Any:
    """Collective restore; leaves adopt ``template``'s shardings."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_abspath(path), _abstract_like(template))


class AsyncSaver:
    """Background-finalized saves with a wait-on-next-save discipline.

    ``save`` returns as soon as device shards are snapshotted; the write
    finalizes on orbax's background thread while the caller runs eval.
    A subsequent ``save`` (or ``close``) first waits for the in-flight
    write -- one overlapped checkpoint per epoch, bounded memory.
    """

    def __init__(self) -> None:
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state: Any, *, force: bool = True) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.save(_abspath(path), args=self._args(state),
                         force=force)

    @staticmethod
    def _args(state: Any):
        import orbax.checkpoint as ocp

        return ocp.args.StandardSave(state)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()

    def __enter__(self) -> "AsyncSaver":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
