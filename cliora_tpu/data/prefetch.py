"""Device prefetch: overlap host->device batch upload with compute.

``jax.device_put`` is asynchronous, so uploading batch t+1 while the
jitted step for batch t is in flight hides transfer latency entirely --
the TPU-native replacement for the reference's DataLoader worker pool +
``.cuda()`` per batch (cliora/data/batch_iterator.py:162-168).
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

DEVICE_KEYS = ("sentences", "neg_samples", "obj_feats")


def _put(batch_map, mesh, on_indivisible="error"):
    out = dict(batch_map)
    if mesh is not None:
        from cliora_tpu.parallel.mesh import shard_batch
        dev = shard_batch(mesh, {
            k: batch_map[k] for k in DEVICE_KEYS
            if batch_map.get(k) is not None}, on_indivisible=on_indivisible)
        out.update(dev)
        return out
    for k in DEVICE_KEYS:
        v = batch_map.get(k)
        if v is not None:
            out[k] = jax.device_put(np.asarray(v))
    return out


def device_prefetch(iterator: Iterator[dict], mesh=None,
                    lookahead: int = 2,
                    on_indivisible: str = "error") -> Iterator[dict]:
    """Yield batch_maps whose device keys are already (asynchronously)
    uploaded, keeping ``lookahead`` batches in flight."""
    buf = []
    for batch_map in iterator:
        buf.append(_put(batch_map, mesh, on_indivisible))
        if len(buf) > lookahead:
            yield buf.pop(0)
    yield from buf
