"""Multi-chip data parallelism over a jax.sharding.Mesh.

The reference's only parallelism is 1-GPU-per-rank DDP with NCCL gradient
allreduce and per-rank batch chunking in the collate fn (reference:
cliora/net/trainer.py:528-575, cliora/data/batch_iterator.py:53-66).  The
TPU-native equivalent is one ``dp`` mesh axis: the batch is sharded over
``dp``, parameters/optimizer state are replicated, and the gradient
all-reduce is inserted by XLA (riding ICI) because the loss is a mean over
the globally-sharded batch -- no hand-written collectives.

Host-feed contract: each process feeds its local shard
(``jax.process_index()``-based), mirroring the reference's rank chunking;
single-process multi-device (the common TPU pod-slice case) just
``device_put``s the global batch with a ``P('dp')`` sharding.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis: str = DP_AXIS,
              mp: int = 1) -> Mesh:
    """Device mesh over the first ``n_devices`` devices.

    ``mp > 1`` builds a 2-D ``(dp, mp)`` mesh for tensor parallelism
    (parallel/sharding.py); ``mp`` is the minor (fastest-varying) axis so
    model-parallel collectives ride adjacent-chip ICI links.
    """
    devs = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devs), (n_devices, len(devs))
        devs = devs[:n_devices]
    if mp > 1:
        assert len(devs) % mp == 0, (len(devs), mp)
        if len({d.process_index for d in devs}) > 1:
            raise NotImplementedError(
                "tensor parallelism (mp > 1) supports single-process "
                "meshes only; multi-process runs use pure dp")
        from cliora_tpu.parallel.sharding import MP_AXIS
        return Mesh(np.asarray(devs).reshape(-1, mp), (axis, MP_AXIS))
    return Mesh(np.asarray(devs), (axis,))


def dp_size(mesh: Mesh) -> int:
    """Number of ways the batch axis is sharded (the dp-axis extent)."""
    return dict(zip(mesh.axis_names, mesh.devices.shape))[DP_AXIS]


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over dp; replicate the rest."""
    return NamedSharding(mesh, P(DP_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_multiprocess(mesh: Mesh) -> bool:
    """Whether the mesh spans devices owned by more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_batch(mesh: Mesh, tree, on_indivisible: str = "error"):
    """Device-put a host batch pytree with batch-axis sharding.

    1-D arrays (shared vectors like the ``(k,)`` negative-sample ids) are
    replicated.  Batch-like arrays (ndim >= 2) whose leading dim isn't
    divisible by the mesh would silently replicate -- every device
    computing the full batch -- so by default that raises; pass
    ``on_indivisible='warn'`` (eval paths) to replicate with a warning
    instead.

    Multi-process meshes: each process holds only its LOCAL batch chunk
    (data/batching.py chunks by ``jax.process_index()``, mirroring the
    reference's rank chunking, cliora/data/batch_iterator.py:53-66), so
    batch-like arrays are assembled into global arrays via
    ``jax.make_array_from_process_local_data``; the divisibility contract
    is local-rows % local-devices.
    """
    assert on_indivisible in ("error", "warn"), on_indivisible
    multiproc = is_multiprocess(mesh)
    n = (len([d for d in mesh.devices.flat
              if d.process_index == jax.process_index()])
         if multiproc else dp_size(mesh))

    def put(x):
        if isinstance(x, jax.Array):
            return x  # already uploaded (e.g. by device_prefetch)
        x = np.asarray(x)
        if x.ndim >= 2:
            if x.shape[0] % n != 0 or x.shape[0] == 0:
                msg = (f"batch axis {x.shape[0]} not divisible by "
                       f"{n}-device mesh"
                       + ("" if multiproc else
                          "; this would replicate the full batch onto "
                          f"every device ({n}x wasted compute)"))
                if on_indivisible == "error" or multiproc:
                    raise ValueError(msg)
                import warnings
                warnings.warn(msg, stacklevel=3)
                return jax.device_put(x, replicated(mesh))
            if multiproc:
                return jax.make_array_from_process_local_data(
                    batch_sharding(mesh, x.ndim), x)
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        if multiproc:
            # shared vector: identical on every process by construction
            # (same-seed samplers), so local data IS the global value
            return jax.make_array_from_process_local_data(
                replicated(mesh), x)
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, tree)


def replicate_tree(mesh: Mesh, tree):
    """Replicate parameters / optimizer state across the mesh.

    Multi-process meshes assemble global arrays from the host value, which
    is identical on every process by construction (same-seed init /
    checkpoint load on all processes).
    """
    sh = replicated(mesh)
    if is_multiprocess(mesh):
        def to_global(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a global array (e.g. re-replication)
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x))
        return jax.tree.map(to_global, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
