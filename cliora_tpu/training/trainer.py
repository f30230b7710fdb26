"""Training engine: loss assembly, optax update, jitted train/eval steps.

The reference's ``Net``/``Trainer`` (cliora/net/trainer.py:227-501) become
pure functions closed over two frozen configs:

  * :class:`ModelConfig` -- architecture (models/config.py);
  * :class:`TrainConfig` -- optimization + loss switches.

One jitted ``train_step`` handles any (batch, length) shape pair; XLA
retraces per shape bucket, which the same-length batcher keeps bounded
(reference's shape discipline, cliora/data/dataloader.py:11-113).
Gradients of frozen parameters are zeroed before the global-norm clip so
the clip norm matches torch's clip-over-trainable-params semantics
(reference: cliora/net/trainer.py:450-455), and Adam state is only
allocated for trainable leaves (optax.masked).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.diora import (
    diora_forward,
    embed_forward,
    image_encoder_forward,
)
from cliora_tpu.models.params import init_params
from cliora_tpu.training.losses import (
    contrastive_loss,
    reconstruction_loss,
    vg_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer + loss configuration.

    (reference flags: cliora/scripts/train.py:337-401; optimizer:
    cliora/net/trainer.py:580)
    """
    lr: float = 5e-4
    grad_clip: float = 5.0
    k_neg: int = 100
    emb_trainable: bool = False     # --emb none and not finetuning
    vg_loss: bool = False           # --vg_loss
    alpha_vg: float = 1.0
    use_contr: bool = False         # --obj_feats --use_contr
    alpha_contr: float = 1.0
    vl_margin: float = 0.2          # --vl_margin (hinge margin)
    freeze: str = "none"            # 'none' | 'diora' | 'except_vis'
    # span x region max reduction: 'einsum' materializes the
    # (B, B, cells, R) tensor (reference semantics); 'chunked'/'pallas'
    # fuse the max so it never exists in HBM (ops/span_region.py)
    attn_impl: str = "einsum"
    # gradient accumulation: split each batch into this many sequential
    # microbatches (lax.scan), average the grads, apply ONE update.
    # Peak activation memory scales with B/accum_steps -- the memory
    # lever orthogonal to --remat.  NOTE: batch-coupled losses
    # (contrastive/VG negatives are the *other examples in the batch*)
    # see microbatch-sized batches, so accum training equals
    # `accum_steps` sequential small-batch steps with one averaged
    # update -- NOT one big-batch step (same caveat as any contrastive
    # gradient accumulation).
    accum_steps: int = 1
    # ZeRO-1: shard Adam mu/nu over the data-parallel mesh axis
    # (parallel/sharding.py zero1_opt_state).  Cuts optimizer memory
    # ~1/dp per chip; update math unchanged (elementwise per shard,
    # GSPMD inserts the reduce-scatter/all-gather).
    zero1: bool = False

    def __post_init__(self):
        assert self.freeze in ("none", "diora", "except_vis"), self.freeze
        assert self.attn_impl in ("einsum", "chunked", "pallas"), \
            self.attn_impl
        assert self.accum_steps >= 1, self.accum_steps


def trainable_mask(tc: TrainConfig, params) -> Any:
    """Pytree of bools mirroring torch ``requires_grad``.

    (reference: cliora/net/trainer.py:351-358 freeze_diora /
    freeze_except_vis; embedding freeze: trainer.py:536-546)
    """
    def decide(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        if tc.freeze == "except_vis":
            return any("_vis" in k for k in keys)
        if "embeddings" in keys:
            return tc.emb_trainable
        if tc.freeze == "diora" and keys[0] == "diora":
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def forward_outputs(
    cfg: ModelConfig,
    tc: TrainConfig,
    params,
    tokens,
    obj_feats=None,
    rng=None,
    train: bool = True,
    with_cky: bool = False,
    outside=None,
    lengths=None,
):
    """Embed -> image-encode -> diora forward (reference: Net.forward,
    cliora/net/trainer.py:272-304).

    Returns (out, aux) where aux carries the embedding/region vectors the
    fused-score losses need.
    """
    x_span, x_word = embed_forward(
        params["embed"], tokens, trainable=tc.emb_trainable)
    obj_span = obj_word = None
    if cfg.use_obj:
        obj_span, obj_word = image_encoder_forward(
            params["img_encoder"], obj_feats)
    need_all_atten = cfg.use_obj and (tc.use_contr or not train)
    out = diora_forward(
        cfg, params, x_span, x_word, obj_span=obj_span, obj_word=obj_word,
        rng=rng, train=train, with_cky=with_cky, outside=outside,
        with_all_atten=need_all_atten,
        materialize_atten=(tc.attn_impl == "einsum"), lengths=lengths)
    aux = {"x_word": x_word, "obj_span": obj_span, "obj_word": obj_word}
    return out, aux


def losses_from(cfg: ModelConfig, tc: TrainConfig, params, tokens,
                neg_samples, out, aux=None,
                lengths=None) -> Dict[str, jax.Array]:
    """All enabled losses from forward outputs.

    (reference: Net.compute_loss, cliora/net/trainer.py:243-270)
    """
    from cliora_tpu.ops.span_region import span_region_max
    from cliora_tpu.training.losses import (
        contrastive_loss_from_scores,
        vg_loss_from_scores,
    )

    metrics: Dict[str, jax.Array] = {}
    recon = reconstruction_loss(
        params["reconstruct"], params["embed"]["embeddings"], tokens,
        neg_samples, out.chart.outside_h, lengths=lengths)
    metrics["reconstruction_softmax_loss"] = recon
    total = recon

    # fused reductions replace the materialized tensors only when the
    # forward skipped them (train mode with attn_impl != 'einsum'); eval
    # keeps the reference's eval-time score mixing (cliora.py:459-464)
    if tc.vg_loss and cfg.use_obj:
        if out.vg_atten_score is None:
            prm = span_region_max(aux["x_word"], aux["obj_word"],
                                  tc.attn_impl)
            vgl = vg_loss_from_scores(prm, alpha_vg=tc.alpha_vg,
                                      lengths=lengths)
        else:
            vgl = vg_loss(out.vg_atten_score, alpha_vg=tc.alpha_vg,
                          lengths=lengths)
        metrics["vg_loss"] = vgl
        total = total + vgl
    if tc.use_contr and cfg.use_obj:
        if out.all_atten_score is None:
            span_vec = out.chart.inside_h + out.chart.outside_h
            scores = span_region_max(span_vec, aux["obj_span"],
                                     tc.attn_impl)
            ctr = contrastive_loss_from_scores(
                out.chart.inside_s, out.chart.outside_s, scores,
                margin=tc.vl_margin, alpha_contr=tc.alpha_contr,
                lengths=lengths)
        else:
            ctr = contrastive_loss(
                out.chart.inside_s, out.chart.outside_s,
                out.all_atten_score,
                margin=tc.vl_margin, alpha_contr=tc.alpha_contr,
                lengths=lengths)
        metrics["contrastive_loss"] = ctr
        total = total + ctr

    metrics["total_loss"] = total
    return metrics


def word_grounding_losses(cfg: ModelConfig, tc: TrainConfig, params,
                          tokens, obj_feats, lengths=None):
    """Chart-free word-level grounding baseline: VG InfoNCE loss only.

    (reference: cliora/net/vg.py:477-482 -- dead code there; here it is a
    selectable --arch word baseline)
    """
    from cliora_tpu.models.word_grounding import word_grounding_forward

    _, x_word = embed_forward(params["embed"], tokens,
                              trainable=tc.emb_trainable)
    _, obj_word = image_encoder_forward(params["img_encoder"], obj_feats)
    wg = word_grounding_forward(x_word, obj_word)
    vgl = vg_loss(wg.vg_atten_score, alpha_vg=tc.alpha_vg, lengths=lengths)
    return wg, {"vg_loss": vgl, "total_loss": vgl}


def compute_losses(
    cfg: ModelConfig,
    tc: TrainConfig,
    params,
    tokens,
    neg_samples,
    obj_feats=None,
    rng=None,
    train: bool = True,
    lengths=None,
):
    """Forward + all enabled losses; returns (total, metrics)."""
    if cfg.arch == "word":
        _, metrics = word_grounding_losses(cfg, tc, params, tokens,
                                           obj_feats, lengths=lengths)
        return metrics["total_loss"], metrics
    out, aux = forward_outputs(cfg, tc, params, tokens, obj_feats=obj_feats,
                               rng=rng, train=train, lengths=lengths)
    metrics = losses_from(cfg, tc, params, tokens, neg_samples, out, aux,
                          lengths=lengths)
    return metrics["total_loss"], metrics


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _local_value(x):
    """Fully-addressable view of a (replicated) global array leaf.

    Under a multi-process mesh the train-state leaves are global arrays
    that are not fully addressable per process: ``np.asarray`` (the
    checkpoint path) and single-device eval dispatch both raise on them.
    Params/opt-state are replicated over ``dp``, so each process's first
    addressable shard already holds the complete value -- the analogue of
    every reference DDP rank owning a full local model
    (cliora/scripts/train.py:105-116).  Genuinely sharded leaves fall back
    to a cross-process allgather.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shard = x.addressable_shards[0]
        if shard.data.shape == x.shape:  # replicated leaf
            return shard.data
        from jax.experimental import multihost_utils
        # tiled=True: concatenate the per-process shards back into the
        # global-shaped value (required for non-fully-addressable
        # inputs).  NOTE this is a COLLECTIVE -- every process must
        # reach it, so callers materialize sharded state on all
        # processes, never inside a chief-only branch (scripts/train.py
        # hoists local_opt_state() above the is_chief block).
        return jnp.asarray(multihost_utils.process_allgather(
            x, tiled=True))
    return x


def make_optimizer(tc: TrainConfig, mask):
    """clip(5.0) -> Adam(lr, (0.9, 0.999), 1e-8), trainable leaves only."""
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.masked(
            optax.adam(tc.lr, b1=0.9, b2=0.999, eps=1e-8), mask),
    )


class Trainer:
    """Owns params/optimizer state and the jitted step functions.

    (reference: cliora/net/trainer.py:337-501 ``Trainer``; here steps are
    pure jitted functions and state is explicit)
    """

    def __init__(self, cfg: ModelConfig, tc: TrainConfig, params, mesh=None):
        self.cfg = cfg
        if (mesh is not None and tc.attn_impl == "pallas"
                and len(mesh.axis_names) > 1):
            # the fused span x region kernel has no SPMD partitioning
            # rules for an mp-sharded program; 'chunked' is the same
            # fused-max math in XLA (ops/span_region.py)
            import warnings
            warnings.warn("attn_impl='pallas' is dp-only; using 'chunked' "
                          "under tensor parallelism", stacklevel=2)
            tc = dataclasses.replace(tc, attn_impl="chunked")
        self.tc = tc
        self.mesh = mesh
        self.mask = trainable_mask(tc, params)
        self.tx = make_optimizer(tc, self.mask)
        self.state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if mesh is not None:
            from cliora_tpu.parallel.mesh import replicate_tree
            from cliora_tpu.parallel.sharding import MP_AXIS, shard_params
            if MP_AXIS in mesh.axis_names:
                # tensor parallel: params get Megatron-style specs and
                # the optimizer state's params-shaped leaves (Adam
                # mu/nu) are placed to match (parallel/sharding.py)
                from cliora_tpu.parallel.sharding import shard_opt_state
                p_sh = shard_params(mesh, params)
                self.state = TrainState(
                    params=p_sh,
                    opt_state=shard_opt_state(
                        mesh, self.state.opt_state, p_sh),
                    step=replicate_tree(mesh, self.state.step),
                )
            else:
                self.state = replicate_tree(mesh, self.state)
            if tc.zero1:
                from cliora_tpu.parallel.sharding import zero1_opt_state
                self.state = self.state._replace(
                    opt_state=zero1_opt_state(
                        mesh, self.state.opt_state, self.state.params))
        # host-side step counter for dropout keys: reading state.step would
        # force a device sync every step.  'rbg' lowers to the TPU hardware
        # RNG (XLA RngBitGenerator): threefry2x32 cost ~4 ms/step just
        # generating the 19 per-level attention-dropout masks at B=128.
        # Same dropout distribution, different stream -- dropout carries no
        # parity contract (the reference uses torch's RNG,
        # cliora/net/cliora.py:32).
        self._host_rng = jax.random.key(1729, impl="rbg")
        self._host_step = 0
        mask_flat = self.mask

        # pin the step outputs to the state's canonical placement:
        # without this GSPMD picks output shardings freely, so the
        # live state's placement drifts from the init placement after
        # step 1 (observed: replicated leaves upgraded to P('mp')),
        # costing one extra compile per shape and making
        # checkpoint-restored trajectories diverge at reduction-order
        # level from uninterrupted ones (tests/test_orbax.py).
        if mesh is not None:
            from jax.sharding import (
                NamedSharding as _NS,
                PartitionSpec as _P,
            )
            _state_out = (jax.tree.map(lambda x: x.sharding, self.state),
                          _NS(mesh, _P()))
        else:
            _state_out = None

        def grads_and_metrics(params, tokens, neg_samples, obj_feats,
                              rng, lengths):
            """Masked loss grads; with accum_steps > 1 a lax.scan over
            microbatches averages the grads (peak activation memory
            scales with the microbatch -- see TrainConfig.accum_steps
            for the batch-coupled-loss semantics)."""
            A = tc.accum_steps

            def grad_of(tok, obj, r, lens):
                def loss_fn(p):
                    return compute_losses(
                        cfg, tc, p, tok, neg_samples, obj_feats=obj,
                        rng=r, train=True, lengths=lens)
                return jax.grad(loss_fn, has_aux=True)(params)

            if A <= 1:
                grads, metrics = grad_of(tokens, obj_feats, rng, lengths)
            else:
                B = tokens.shape[0]
                assert B % A == 0, \
                    f"batch {B} not divisible by accum_steps {A}"

                def split(x):
                    return (None if x is None
                            else x.reshape((A, B // A) + x.shape[1:]))

                xs = {"tok": split(tokens), "i": jnp.arange(A)}
                if obj_feats is not None:
                    xs["obj"] = split(obj_feats)
                if lengths is not None:
                    xs["lens"] = split(lengths)

                def body(acc, x):
                    r = (jax.random.fold_in(rng, x["i"])
                         if rng is not None else None)
                    g, m = grad_of(x["tok"], x.get("obj"), r,
                                   x.get("lens"))
                    return jax.tree.map(jnp.add, acc, (g, m)), None

                # zeros-initialized accumulator (shapes via eval_shape):
                # seeding it from an unrolled first microbatch would
                # duplicate the whole grad graph in the compiled program
                # (one unrolled copy + one scan-body copy) -- real
                # compile-time money at 30-90 s/program over the tunnel
                first = jax.tree.map(lambda v: v[0], xs)
                abstract = jax.eval_shape(
                    grad_of, first["tok"], first.get("obj"), rng,
                    first.get("lens"))
                zero = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), abstract)
                acc, _ = jax.lax.scan(body, zero, xs)
                grads, metrics = jax.tree.map(lambda s: s / A, acc)
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g),
                grads, mask_flat)
            return grads, metrics

        @functools.partial(jax.jit, donate_argnums=0,
                           out_shardings=_state_out)
        def train_step(state: TrainState, tokens, neg_samples, obj_feats,
                       rng, lengths=None) -> tuple:
            grads, metrics = grads_and_metrics(
                state.params, tokens, neg_samples, obj_feats, rng,
                lengths)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), metrics

        @functools.partial(jax.jit, donate_argnums=0,
                           out_shardings=_state_out)
        def multi_step(state: TrainState, batches, rng) -> tuple:
            """K same-shape batches -> K optimizer steps in ONE XLA
            program (lax.scan).  Amortizes per-dispatch latency -- host
            dispatch/tunnel round trips are the train-loop floor on
            remote-attached TPUs (BASELINE.md round 3).

            ``batches`` is a TUPLE of per-step batch dicts; stacking to
            the (K, ...) scan operands happens here inside the jit so
            multi-process global arrays never hit an eager op (jax
            forbids eager compute on non-fully-addressable arrays)."""
            xs = jax.tree.map(lambda *v: jnp.stack(v), *batches)

            def body(st, x):
                grads, metrics = grads_and_metrics(
                    st.params, x["tokens"], x["neg"], x.get("obj"),
                    jax.random.fold_in(rng, st.step), x.get("lengths"))
                updates, opt_state = self.tx.update(
                    grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return TrainState(params, opt_state, st.step + 1), metrics

            return jax.lax.scan(body, state, xs)

        @jax.jit
        def eval_step(params, tokens, neg_samples, obj_feats, lengths=None):
            total, metrics = compute_losses(
                cfg, tc, params, tokens, neg_samples, obj_feats=obj_feats,
                rng=None, train=False, lengths=lengths)
            return metrics

        @functools.partial(
            jax.jit,
            static_argnames=("compute_loss", "outside", "with_chart"))
        def parse_step(params, tokens, neg_samples, obj_feats,
                       compute_loss: bool, outside: bool,
                       with_chart: bool = False, lengths=None):
            if cfg.arch == "word":
                # chart-free baseline: no trees, grounding scores only
                wg, metrics = word_grounding_losses(
                    cfg, tc, params, tokens, obj_feats, lengths=lengths)
                return ({"atten_score": wg.atten_score},
                        metrics if compute_loss else {})
            out, aux = forward_outputs(
                cfg, tc, params, tokens, obj_feats=obj_feats, rng=None,
                train=False, with_cky=True, outside=outside,
                lengths=lengths)
            res = {"cky_bp": out.chart.cky_bp}
            if with_chart:
                res["inside_h"] = out.chart.inside_h
                if outside:
                    res["outside_h"] = out.chart.outside_h
            if cfg.use_obj:
                B = tokens.shape[0]
                res["atten_score"] = out.atten_score
                # per-example diagonal of the span x region scores
                # (reference: cliora/scripts/parse.py:169-172)
                res["span_scores"] = out.all_atten_score[
                    jnp.arange(B), jnp.arange(B)]
            metrics = {}
            if compute_loss:
                metrics = losses_from(cfg, tc, params, tokens,
                                      neg_samples, out, aux,
                                      lengths=lengths)
            return res, metrics

        @jax.jit
        def parse_pallas(params, tokens):
            from cliora_tpu.models.diora import leaf_transform
            from cliora_tpu.ops.pallas_chart import fused_inside_cky_pallas

            x_span, _ = embed_forward(params["embed"], tokens)
            h0, _ = leaf_transform(cfg, params["diora"], x_span)
            _, bp, _ = fused_inside_cky_pallas(
                params["diora"], h0, norm=cfg.normalize,
                compute_dtype=cfg.compute_dtype)
            return bp

        self._train_step = train_step
        self._multi_step = multi_step
        self._eval_step = eval_step
        self._parse_step = parse_step
        self._parse_pallas = parse_pallas

    @classmethod
    def build(cls, cfg: ModelConfig, tc: TrainConfig, embeddings,
              seed: int = 0, mesh=None) -> "Trainer":
        """(reference: cliora/net/trainer.py:504-582 ``build_net``)"""
        params = init_params(jax.random.PRNGKey(seed), cfg, embeddings)
        return cls(cfg, tc, params, mesh=mesh)

    @property
    def params(self):
        return self.state.params

    @property
    def multiprocess(self) -> bool:
        from cliora_tpu.parallel.mesh import is_multiprocess
        return self.mesh is not None and is_multiprocess(self.mesh)

    @property
    def tensor_parallel(self) -> bool:
        from cliora_tpu.parallel.sharding import MP_AXIS
        return self.mesh is not None and MP_AXIS in self.mesh.axis_names

    def install_state(self, params=None, opt_state=None):
        """Re-place loaded (host-side) params / optimizer state on this
        trainer's mesh, preserving the placement discipline: replicated
        under pure dp, Megatron-sharded under tensor parallelism (the
        checkpoint-load paths previously replicate_tree'd everything,
        silently undoing ``--mp`` sharding)."""
        params = self.state.params if params is None else params
        opt_state = self.state.opt_state if opt_state is None else opt_state
        if self.mesh is None:
            self.state = TrainState(params, opt_state, self.state.step)
            return
        from cliora_tpu.parallel.mesh import replicate_tree
        if self.tensor_parallel:
            from cliora_tpu.parallel.sharding import (
                shard_opt_state,
                shard_params,
            )
            params = shard_params(self.mesh, params)
            opt_state = shard_opt_state(self.mesh, opt_state, params)
        else:
            params = replicate_tree(self.mesh, params)
            opt_state = replicate_tree(self.mesh, opt_state)
        if self.tc.zero1:
            # restore the ZeRO-1 placement too -- otherwise the first
            # resumed step sees differently-placed inputs (one hidden
            # recompile) before the pinned out_shardings re-shard them
            from cliora_tpu.parallel.sharding import zero1_opt_state
            opt_state = zero1_opt_state(self.mesh, opt_state, params)
        self.state = TrainState(params, opt_state, self.state.step)

    def set_step(self, n: int):
        """Restore the step counter for exact resume: both the host-side
        dropout-stream counter and the device TrainState.step (the rng
        fold_in key inside the jitted step), placed like init placed it
        so the pinned out_shardings don't see a new layout."""
        self._host_step = int(n)
        step = jnp.asarray(int(n), jnp.int32)
        if self.mesh is not None:
            from cliora_tpu.parallel.mesh import replicate_tree
            step = replicate_tree(self.mesh, step)
        self.state = self.state._replace(step=step)

    def local_params(self):
        """Params as fully-addressable arrays (see ``_local_value``)."""
        return jax.tree.map(_local_value, self.state.params)

    def local_opt_state(self):
        return jax.tree.map(_local_value, self.state.opt_state)

    def epoch_barrier(self):
        """Keep processes in step at epoch boundaries so non-chief
        processes don't run ahead of the chief's eval+checkpoint into the
        next epoch's collectives."""
        if self.multiprocess:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("cliora_tpu.epoch")

    def _place_batch(self, batch_map, on_indivisible: str = "error"):
        """Place one batch_map's device leaves (mesh-aware).

        Returns (tokens, neg, obj, lengths) as device arrays -- batch
        axes sharded over dp, shared vectors replicated; under a
        multi-process mesh per-process local chunks are assembled into
        global arrays (parallel/mesh.py shard_batch)."""
        lengths = batch_map.get("lengths")
        if self.mesh is not None:
            from cliora_tpu.parallel.mesh import (
                batch_sharding,
                shard_batch,
            )
            sharded = shard_batch(self.mesh, {
                k: batch_map[k]
                for k in ("sentences", "neg_samples", "obj_feats")
                if batch_map.get(k) is not None},
                on_indivisible=on_indivisible)
            tokens = sharded["sentences"]
            neg = sharded["neg_samples"]
            obj = sharded.get("obj_feats")
            if lengths is not None and not isinstance(lengths, jax.Array):
                # (B,) but batch-sharded, unlike other 1-D (shared)
                # arrays; under a multi-process mesh each process holds
                # only its local chunk (data/batching.py row-chunks
                # 'lengths' with the rest of the batch), so the global
                # array is assembled like shard_batch does for 2-D arrays
                sh = batch_sharding(self.mesh, 1)
                arr = np.asarray(lengths, np.int32)
                if self.multiprocess:
                    lengths = jax.make_array_from_process_local_data(
                        sh, arr)
                else:
                    lengths = jax.device_put(arr, sh)
        else:
            tokens = jnp.asarray(batch_map["sentences"])
            neg = jnp.asarray(batch_map["neg_samples"])
            obj = batch_map.get("obj_feats")
            obj = jnp.asarray(obj) if obj is not None else None
            if lengths is not None:
                lengths = jnp.asarray(lengths, jnp.int32)
        return tokens, neg, obj, lengths

    def step(self, batch_map: Dict[str, Any], train: bool = True,
             rng: Optional[jax.Array] = None):
        """One optimization (or eval) step from a host-side batch_map.

        batch_map: {'sentences': (B, L) int, 'neg_samples': (k,) int,
                    'obj_feats': (B, R, F) float or None}
        Returns metrics dict of python floats.
        """
        if not train and self.multiprocess:
            # eval is per-process-local (chief-only in the epoch loop):
            # run it on the addressable param replica with plain local
            # arrays, off the global mesh -- dispatching a global-mesh
            # computation from one process would hang the collective.
            lengths = batch_map.get("lengths")
            tokens = jnp.asarray(batch_map["sentences"])
            neg = jnp.asarray(batch_map["neg_samples"])
            obj = batch_map.get("obj_feats")
            obj = jnp.asarray(obj) if obj is not None else None
            if lengths is not None:
                lengths = jnp.asarray(lengths, jnp.int32)
            metrics = self._eval_step(self.local_params(), tokens, neg,
                                      obj, lengths)
            return metrics
        tokens, neg, obj, lengths = self._place_batch(
            batch_map, on_indivisible="error" if train else "warn")
        if train:
            if rng is None:
                rng = jax.random.fold_in(self._host_rng, self._host_step)
                self._host_step += 1
            self.state, metrics = self._train_step(
                self.state, tokens, neg, obj, rng, lengths)
        else:
            metrics = self._eval_step(self.params, tokens, neg, obj,
                                      lengths)
        # Metrics stay device-resident: converting here would force a sync
        # every step and serialize the host->device pipeline (float() them
        # when logging).
        return metrics

    def steps(self, batch_maps):
        """Run ``len(batch_maps)`` same-shape train steps in one dispatch.

        Returns a list of per-step metrics dicts (lazy device slices of
        the scan-stacked metrics).  Requires all batch_maps to share
        shapes (the CLI groups consecutive same-bucket batches,
        scripts/train.py).  Works under a multi-process mesh too: each
        batch is placed exactly like ``step`` places it (per-process
        local chunks assembled into dp-sharded global arrays) and the
        K-stacking happens inside the jitted program -- every process
        must call ``steps`` with the same K and shapes (the same
        collective contract as K calls to ``step``).
        """
        assert batch_maps
        K = len(batch_maps)
        shapes = {tuple(bm["sentences"].shape) for bm in batch_maps}
        assert len(shapes) == 1, shapes

        batches = []
        for bm in batch_maps:
            tokens, neg, obj, lengths = self._place_batch(bm)
            b = {"tokens": tokens, "neg": neg}
            if obj is not None:
                b["obj"] = obj
            if lengths is not None:
                b["lengths"] = lengths
            batches.append(b)
        rng = jax.random.fold_in(self._host_rng, self._host_step)
        self._host_step += K
        self.state, metrics = self._multi_step(
            self.state, tuple(batches), rng)
        if self.multiprocess:
            # metrics are replicated (pinned out_shardings) but not
            # fully addressable per process; slice each process's own
            # replica lazily (no collective, stays async)
            metrics = jax.tree.map(_local_value, metrics)
        return [jax.tree.map(lambda m, k=k: m[k], metrics)
                for k in range(K)]

    def parse(self, batch_map: Dict[str, Any], compute_loss: bool = False,
              outside: Optional[bool] = None, with_chart: bool = False,
              impl: Optional[str] = None):
        """Eval forward with fused CKY.  Returns (res, metrics) where res
        holds numpy ``cky_bp`` (B, ncells) and, for CLIORA,
        ``atten_score`` (B, L, R) / ``span_scores`` (B, ncells, R).

        ``outside`` default follows the reference eval toggle
        (scripts/train.py:130: off for text-only DIORA, on for CLIORA).
        ``impl`` overrides cfg.parse_impl; 'pallas' routes the text-only
        decode through the fused VMEM-resident kernel when it supports
        the shape (ops/pallas_chart.py).

        ``res["parse_impl"]`` records which backend actually decoded the
        batch.  At f32 the two backends produce identical backpointers
        (first-max argmax convention, pinned by tests/test_pallas_chart
        .py); under bf16 charts split-score rounding differs and ~0.5%
        of backpointers can disagree (ops/pallas_chart.py:45), so
        published trees must be attributed to their backend --
        scripts/parse.py stamps this into parse.jsonl.
        """
        impl = impl or self.cfg.parse_impl
        if impl == "auto":
            # pallas only on real TPU backends: interpret mode (CPU) is
            # orders of magnitude slower and for kernel tests only
            impl = ("pallas" if jax.default_backend() in ("tpu", "axon")
                    else "xla")
        if impl == "pallas" and self.tensor_parallel:
            # pallas_call has no SPMD partitioning rules for mp-sharded
            # params; the XLA path reshards transparently
            impl = "xla"
        # parse/eval is per-process-local; see Trainer.step's eval branch
        params = self.local_params() if self.multiprocess else self.params
        # the fused kernel implements the mlp compose + soft split
        # softmax only: hard (S-DIORA) aggregation would silently decode
        # different trees and treelstm params have no fc0/fc1
        if (impl == "pallas" and not compute_loss and not with_chart
                and not self.cfg.use_obj
                and self.cfg.arch == "mlp"
                and self.cfg.aggregate == "soft"
                and batch_map.get("lengths") is None):
            from cliora_tpu.ops.pallas_chart import supports

            tokens_np = np.asarray(batch_map["sentences"])
            B, L = tokens_np.shape
            if supports(L, self.cfg.size, B, self.cfg.compute_dtype):
                bp = self._parse_pallas(params, jnp.asarray(tokens_np))
                return {"cky_bp": np.asarray(bp),
                        "parse_impl": "pallas"}, {}
        tokens = jnp.asarray(batch_map["sentences"])
        neg = batch_map.get("neg_samples")
        neg = jnp.asarray(neg) if neg is not None else jnp.zeros(
            (1,), jnp.int32)
        obj = batch_map.get("obj_feats")
        obj = jnp.asarray(obj) if obj is not None else None
        lengths = batch_map.get("lengths")
        if lengths is not None:
            lengths = jnp.asarray(lengths, jnp.int32)
        if outside is None:
            outside = self.cfg.use_obj
        if compute_loss:
            outside = True  # losses need the outside chart
        res, metrics = self._parse_step(
            params, tokens, neg, obj, compute_loss=compute_loss,
            outside=outside, with_chart=with_chart, lengths=lengths)
        res = {k: np.asarray(v) for k, v in res.items()}
        res["parse_impl"] = "xla"
        return res, {k: float(v) for k, v in metrics.items()}

    def parameter_norm(self, trainable_only: bool = True) -> float:
        """Sum of per-parameter L2 norms (reference: trainer.py:360-367)."""
        total = 0.0
        p = self.local_params() if self.multiprocess else self.params
        leaves = jax.tree.leaves(p)
        masks = jax.tree.leaves(self.mask)
        for p, m in zip(leaves, masks):
            if trainable_only and not m:
                continue
            total += float(jnp.linalg.norm(p.reshape(-1)))
        return total
