"""Tensor (model) parallelism: parameter partition specs for a 2-D mesh.

The reference has no model parallelism at all (SURVEY.md §2.4: DDP data
parallel only, cliora/net/trainer.py:528-575).  This module is a
beyond-reference TPU-native extension: a second ``mp`` mesh axis shards
the weight matrices Megatron-style and lets XLA's SPMD partitioner place
the collectives (no hand-written all-reduces):

  * compose ``fc0`` is column-parallel (its ``(out=D, in=2D)`` torch-layout
    weight is sharded on dim 0, the bias with it), so the big per-level
    ``(B, L*N, D)`` hidden intermediate is sharded over ``mp``;
  * compose ``fc1`` is row-parallel (weight sharded on the contracted
    input dim): the pair forms the classic column→row Megatron block with
    ONE psum per compose, inserted by GSPMD;
  * the bilinear score ``mat (D, D)`` is column-parallel: the projection
    ``a @ mat`` is sharded on the output dim and the following row-dot
    contracts it, so the score's psum is over per-shard partial sums;
  * the embedding table ``(V, E)``, embed projections ``(D, E)``, the
    reconstruction projection ``(D, E)`` and the image-encoder ``(D, F)``
    maps are row-parallel over their (large) input-feature dims.

Everything else (biases of row-parallel layers, leaf transforms, root
vectors, TreeLSTM gates) is replicated -- they are small and off the hot
path.  Specs are *hints on the parameters only*: activations inherit
shardings through GSPMD propagation, which keeps the chart functional
loop unchanged.

Scope: single-process meshes (the TPU pod-slice case); combining ``mp``
with multi-*process* data parallelism is rejected at mesh construction
(parallel/mesh.py).
"""

from __future__ import annotations

import functools
import warnings

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MP_AXIS = "mp"


@functools.lru_cache(maxsize=None)
def _reshard_fn(sharding: NamedSharding):
    """One cached jitted identity per target sharding: a fresh
    ``jax.jit(lambda ...)`` per leaf would defeat jit's function-identity
    cache and compile a separate tiny SPMD program per optimizer leaf
    (seconds each over a remote-compile tunnel)."""
    return jax.jit(lambda a: a, out_shardings=sharding)


def _spec_for(keys) -> P:
    """PartitionSpec for a parameter path (tuple of str keys)."""
    k = list(keys)
    if len(k) >= 2:
        parent, name = k[-2], k[-1]
        if parent == "fc0":
            # column-parallel: torch layout (out, in) -> shard out
            return P(MP_AXIS, None) if name == "w" else P(MP_AXIS)
        if parent == "fc1" and name == "w":
            # row-parallel: shard the contracted input dim
            return P(None, MP_AXIS)
        if parent in ("inside_score", "outside_score") and name == "mat":
            return P(None, MP_AXIS)
        if parent == "embed" and name in ("embeddings", "mat", "mat1"):
            # (V, E) table / (D, E) projections: shard the E feature dim
            return P(None, MP_AXIS)
        if parent == "reconstruct" and name == "mat":
            return P(None, MP_AXIS)          # (D, E): shard E
        if parent in ("fc", "fc_vis") and name == "w" and k[0] == "img_encoder":
            return P(None, MP_AXIS)          # (D, F): shard F
    return P()


def param_specs(params):
    """Pytree of PartitionSpecs mirroring ``params``.

    Leaves whose sharded dim is not divisible by the mesh's ``mp`` size
    are replicated instead (with a warning) by :func:`shard_params`.
    """
    def spec(path, _):
        return _spec_for(tuple(getattr(p, "key", str(p)) for p in path))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params):
    """Device-put ``params`` onto a ('dp', 'mp') mesh per :func:`param_specs`.

    Falls back to replication (warning) for any leaf whose sharded dim is
    not divisible by the ``mp`` axis size.
    """
    assert MP_AXIS in mesh.axis_names, mesh.axis_names
    mp = dict(zip(mesh.axis_names, mesh.devices.shape))[MP_AXIS]
    specs = param_specs(params)

    def put(path, x, spec):
        for dim, ax in enumerate(spec):
            if ax == MP_AXIS and x.shape[dim] % mp != 0:
                name = "/".join(getattr(p, "key", str(p)) for p in path)
                warnings.warn(
                    f"param {name}: dim {dim} ({x.shape[dim]}) not "
                    f"divisible by mp={mp}; replicating", stacklevel=2)
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params, specs)


def zero1_opt_state(mesh: Mesh, opt_state, params):
    """ZeRO-1: shard params-shaped optimizer-state leaves over ``dp``.

    The reference replicates optimizer state per rank (plain DDP +
    torch Adam, cliora/net/trainer.py:580); so does our default dp
    path.  With ZeRO-1 each Adam ``mu``/``nu`` leaf instead lives
    sharded over the data-parallel axis: XLA's SPMD partitioner then
    reduce-scatters the gradient into the update, updates the local
    1/dp shard, and all-gathers the fresh params -- the classic ZeRO-1
    dataflow, derived by GSPMD purely from these output shardings (the
    train step pins ``out_shardings`` to the state's placement,
    training/trainer.py).  Optimizer memory per chip drops ~1/dp for
    the sharded leaves; parameter updates are elementwise, so the math
    is unchanged (pinned by tests/test_parallel.py zero1 parity).

    Composes with tensor parallelism: a leaf already sharded over
    ``mp`` gains a ``dp`` component on its first free divisible dim.
    Leaves with no dp-divisible free dim keep their existing placement.
    """
    from cliora_tpu.parallel.mesh import DP_AXIS

    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DP_AXIS, 1)
    if dp <= 1:
        return opt_state

    by_path = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        by_path[_path_keys(path)] = leaf.sharding

    def zero_spec(spec: P, shape) -> P:
        parts = list(spec) + [None] * (len(shape) - len(spec))
        for dim, size in enumerate(shape):
            if parts[dim] is None and size % dp == 0:
                parts[dim] = DP_AXIS
                return P(*parts)
        return spec

    def put(path, x):
        keys = _path_keys(path)
        for i in range(len(keys)):
            sh = by_path.get(keys[i:])
            if sh is not None:
                target = NamedSharding(mesh, zero_spec(sh.spec, x.shape))
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    # multi-process global array (replicate_tree already
                    # ran): eager device_put cannot reshard it -- a
                    # jitted identity is an SPMD program, so GSPMD slices
                    # the replicated value down to the dp shard locally
                    return _reshard_fn(target)(x)
                return jax.device_put(x, target)
        return x  # non-params leaf (counts, empty states): keep as-is

    return jax.tree_util.tree_map_with_path(put, opt_state)


def _path_keys(path):
    return tuple(str(getattr(p, "key", getattr(p, "idx", getattr(
        p, "name", p)))) for p in path)


def shard_opt_state(mesh: Mesh, opt_state, sharded_params):
    """Place optimizer-state leaves like their underlying parameters.

    Optax state trees embed params-shaped subtrees (Adam ``mu``/``nu``)
    under wrapper nodes, so each state leaf whose path *suffix* matches a
    parameter path inherits that parameter's realized sharding
    (including any divisibility fallbacks); everything else (counts,
    empty states) is replicated.  Explicit placement is needed because
    ``jit(tx.init)`` has no value dataflow from params to the zeros_like
    outputs for GSPMD to propagate shardings through.
    """
    by_path = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(sharded_params)[0]:
        by_path[_path_keys(path)] = leaf.sharding

    rep = NamedSharding(mesh, P())

    def put(path, x):
        keys = _path_keys(path)
        for i in range(len(keys)):
            sh = by_path.get(keys[i:])
            if sh is not None:
                return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(put, opt_state)
