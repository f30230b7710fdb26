"""Training entry point.

Usage mirrors the reference driver scripts (reference:
cliora/scripts/train.py, train_diora.sh, train_cliora.sh), e.g.::

    python -m cliora_tpu.scripts.train \
        --data_type flickr --emb skip \
        --train_path flickr_data/flickr_train.json \
        --validation_path flickr_data/flickr_test.json \
        --embeddings_path skip_thoughts_dict.pkl \
        --batch_size 32 --hidden_dim 400 --k_neg 100 --lr 5e-4 \
        --max_epoch 30 --train_filter_length 40

Multi-chip: data-parallel over all local devices by default
(``--n_devices`` to restrict); no torch.distributed.launch equivalent is
needed.
"""

from __future__ import annotations

import os
import random
import time

import jax
import jax.profiler  # noqa: F401  (used by --profile_steps)
import numpy as np

from cliora_tpu.analysis.eval import run_eval
from cliora_tpu.parallel.mesh import make_mesh
from cliora_tpu.scripts.common import (
    build_trainer,
    get_train_and_validation,
    get_train_iterator,
    get_validation_iterator,
)
from cliora_tpu.training.checkpoint import (
    export_torch_checkpoint,
    save_opt_state,
    save_params,
)
from cliora_tpu.utils.checkpoint import save_experiment
from cliora_tpu.utils.flags import (
    argument_parser,
    parse_args,
    save_flags,
    stringify_flags,
)
from cliora_tpu.utils.observability import (
    ExperimentLogger,
    configure_experiment,
    get_logger,
)


def generate_seeds(n, seed=11):
    """(reference: cliora/scripts/train.py:42-45)"""
    random.seed(seed)
    return [random.randint(0, 2 ** 16) for _ in range(n)]


def step_stream(trainer, batches, steps_per_call: int = 1,
                max_steps=None):
    """Yield (batch_map, metrics) pairs; with steps_per_call > 1,
    consecutive same-shape batches are run as ONE device dispatch
    (Trainer.steps) to amortize per-dispatch latency.

    ``max_steps`` caps the total optimizer steps *applied*: the final
    group is truncated so --max_step never overshoots by up to K-1
    silently-applied-but-uncounted updates (one extra compile for the
    remainder shape is the cost).

    Failures report the offending batch shape before propagating
    (reference: cliora/net/trainer.py:469-481)."""
    def shape_of(bm):
        # works for numpy and (prefetched) device arrays without a sync
        return tuple(bm["sentences"].shape)

    def run(fn, bms):
        try:
            return fn()
        except Exception:
            get_logger().info("Step failed with batch shape: {}".format(
                shape_of(bms[0])))
            raise

    if steps_per_call <= 1:
        for bm in batches:
            yield bm, run(lambda: trainer.step(bm), [bm])
        return

    pending = []
    done = 0

    def flush():
        nonlocal done
        if not pending:
            return
        group = pending[:]
        ms = run(lambda: trainer.steps(group), group)
        pending.clear()
        done += len(group)
        yield from zip(group, ms)

    def budget():
        return (steps_per_call if max_steps is None
                else min(steps_per_call, max_steps - done))

    for bm in batches:
        if max_steps is not None and done >= max_steps:
            return
        if pending and shape_of(bm) != shape_of(pending[0]):
            yield from flush()
            if max_steps is not None and done >= max_steps:
                return
        pending.append(bm)
        if len(pending) >= budget():
            yield from flush()
    yield from flush()


def run_train(options, train_iterator, trainer, validation_iterator):
    logger = get_logger()
    experiment_logger = ExperimentLogger()
    save_emb = options.emb == "none"
    is_chief = jax.process_index() == 0

    seeds = generate_seeds(options.max_epoch, options.seed)
    step = 0
    start_epoch = 0
    from cliora_tpu.scripts.common import resume_state
    rst = resume_state(options)
    if rst:
        # exact resume: restart at the epoch AFTER the checkpointed one,
        # with the recorded optimizer-step count, so the epoch-seed
        # schedule (and hence batch order) continues exactly where the
        # uninterrupted run would be (tests/test_cli.py).  The counter
        # restore happened in build_trainer.
        start_epoch = int(rst["epoch"]) + 1
        step = int(rst.get("step", 0))
        if rst.get("seed") is not None and rst["seed"] != options.seed:
            logger.info(
                f"WARNING: resuming with --seed {options.seed} but the "
                f"checkpoint was trained with seed {rst['seed']}; batch "
                f"order will not reproduce the original run")
        logger.info(f"resume: starting at epoch {start_epoch}, "
                    f"step {step}")
    best_f1 = -1.0
    best_epoch = None
    if rst:
        # keep-best continuity: without this a resumed run could demote
        # model.best to a worse post-resume epoch
        best_f1 = float(rst.get("best_f1", -1.0))
        best_epoch = rst.get("best_epoch")
    profiling = False
    orbax_saver = None
    if getattr(options, "ckpt_backend", "npz") == "orbax":
        from cliora_tpu.training.orbax_ckpt import AsyncSaver
        orbax_saver = AsyncSaver()

    from cliora_tpu.data.prefetch import device_prefetch

    try:
        for epoch, seed in zip(range(options.max_epoch), seeds):
            if epoch < start_epoch:
                continue
            logger.info(f"epoch={epoch} seed={seed}")
            batches = (bm for bm in train_iterator.get_iterator(
                random_seed=seed) if bm["length"] > 2)
            remaining = (None if options.max_step is None
                         else max(0, options.max_step - step))
            stream = step_stream(
                trainer, device_prefetch(batches, mesh=trainer.mesh),
                getattr(options, "steps_per_call", 1),
                max_steps=remaining)
            epoch_t0, epoch_sents = time.time(), 0
            while True:
                if options.profile_steps and step == 0:
                    jax.profiler.start_trace(
                        os.path.join(options.experiment_path, "profile"))
                    profiling = True
                try:
                    batch_map, metrics = next(stream)
                except StopIteration:
                    break
                result = dict(metrics)
                if profiling and step + 1 >= options.profile_steps:
                    profiling = _stop_profiler(trainer, options, logger)
                result["length"] = batch_map["length"]
                result["batch_size"] = batch_map["batch_size"]
                # count REAL sentences only (padded/repeated rows do
                # work but carry no training signal) so the epoch
                # sents/s line is comparable to tools/bench_bucketed.py
                epoch_sents += int(batch_map.get(
                    "real_size", batch_map["batch_size"]))
                experiment_logger.record(result)
                if step % options.log_every_batch == 0:
                    experiment_logger.log_batch(
                        epoch, step, step, batch_size=options.batch_size)
                step += 1
                if options.max_step is not None and step >= options.max_step:
                    break

            # approximate throughput: the stream is pipelined/lazy, so
            # the last dispatches may still be in flight -- good enough
            # for the epoch log line
            experiment_logger.log_epoch(
                epoch, step, n_sentences=epoch_sents,
                wall_s=time.time() - epoch_t0)

            base = os.path.join(options.experiment_path,
                                f"model.epoch_{epoch}")
            if orbax_saver is not None:
                # collective sharded write (ALL processes), finalized on
                # a background thread -- the chief's eval below overlaps
                # the checkpoint I/O (training/orbax_ckpt.py)
                orbax_saver.save(base + ".orbax", trainer.state)
            # materialized on ALL processes: with --zero1 the opt state
            # is dp-sharded and _local_value's allgather is a collective
            # (a chief-only call would deadlock the other processes)
            local_params = trainer.local_params()
            local_opt = (trainer.local_opt_state()
                         if orbax_saver is None else None)
            if is_chief:
                if orbax_saver is None:
                    save_params(base + ".npz", local_params,
                                save_embeddings=save_emb)
                    export_torch_checkpoint(base + ".pt", local_params,
                                            save_embeddings=save_emb)
                    save_opt_state(base + ".opt.pkl", local_opt)
                save_experiment(
                    os.path.join(options.experiment_path,
                                 f"experiment.epoch_{epoch}.json"), step,
                    epoch=epoch, host_step=trainer._host_step,
                    seed=options.seed)
                _prune_checkpoints(options, epoch, logger)

            # distributed eval: under a multi-process mesh every process
            # decodes a share of the validation batches and the counters
            # are allreduced (analysis/eval.py) -- a COLLECTIVE, so it
            # runs on all processes (chief-only would deadlock it and
            # idle the rest of the pod through eval anyway)
            metrics = run_eval(trainer, validation_iterator,
                               seed=options.seed,
                               use_obj=options.obj_feats)
            corpus_f1 = metrics["corpus_f1"]
            if corpus_f1 > best_f1:
                best_f1, best_epoch = corpus_f1, epoch
            if is_chief:
                # refresh the snapshot with this epoch's eval so a
                # resumed run keeps the keep-best state too
                save_experiment(
                    os.path.join(options.experiment_path,
                                 f"experiment.epoch_{epoch}.json"), step,
                    epoch=epoch, host_step=trainer._host_step,
                    seed=options.seed, best_f1=best_f1,
                    best_epoch=best_epoch)
                if best_epoch == epoch:
                    # keep-best checkpoint: F1 oscillates +-0.03 late in
                    # training (BASELINE.md), so the last epoch is usually
                    # not the best one.  The reference keeps only per-epoch
                    # files (cliora/scripts/train.py:105-107).
                    best = os.path.join(options.experiment_path,
                                        "model.best")
                    save_params(best + ".npz", local_params,
                                save_embeddings=save_emb,
                                extra={"epoch": epoch,
                                       "corpus_f1": corpus_f1})
                    export_torch_checkpoint(best + ".pt", local_params,
                                            save_embeddings=save_emb)
                logger.info(
                    f"epoch={epoch} corpus_f1={corpus_f1:.4f} "
                    f"sent_f1={metrics['sent_f1']:.4f} "
                    f"grounding_acc={metrics['grounding_acc']:.4f} "
                    f"best_f1={best_f1:.4f}")
            trainer.epoch_barrier()

            if options.max_step is not None and step >= options.max_step:
                logger.info(f"Max-Step={options.max_step} Quitting.")
                break
    finally:
        if profiling:
            _stop_profiler(trainer, options, logger)
        if orbax_saver is not None:
            orbax_saver.close()  # waits for the in-flight write
        if is_chief and best_epoch is not None:
            logger.info(f"best model: epoch={best_epoch} "
                        f"corpus_f1={best_f1:.4f} "
                        f"(model.best.npz / model.best.pt)")


def _prune_checkpoints(options, epoch, logger):
    """``--ckpt_keep N``: keep only the newest N per-epoch checkpoints
    (all backends: npz/pt/opt.pkl triplets and .orbax dirs).

    ``model.best.*`` and the experiment jsons are never pruned.  Under
    the async orbax backend every epoch <= current-1 is already
    finalized (AsyncSaver waits for the in-flight write before starting
    the next), so pruning ``epoch - keep`` and older is race-free.
    Default 0 keeps every epoch, like the reference
    (cliora/scripts/train.py:105-107)."""
    keep = getattr(options, "ckpt_keep", 0) or 0
    if keep < 1:
        return
    import glob
    import re
    import shutil

    by_epoch = {}
    for p in glob.glob(os.path.join(options.experiment_path,
                                    "model.epoch_*")):
        m = re.match(r"model\.epoch_(\d+)\.", os.path.basename(p))
        if m:
            by_epoch.setdefault(int(m.group(1)), []).append(p)
    for e in sorted(by_epoch):
        if e <= epoch - keep:
            for p in by_epoch[e]:
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
            logger.info(
                f"pruned epoch-{e} checkpoint (--ckpt_keep {keep})")


def _stop_profiler(trainer, options, logger) -> bool:
    """Close the --profile_steps trace; returns the new profiling flag."""
    # value sync, not block_until_ready: the latter returns early on
    # lax.scan outputs over the TPU tunnel (CLAUDE.md), and with
    # --steps_per_call the params ARE scan carries
    from cliora_tpu.training.trainer import _local_value
    float(_local_value(jax.tree.leaves(trainer.state.params)[0]).ravel()[0])
    jax.profiler.stop_trace()
    logger.info("Profiler trace written to {}/profile".format(
        options.experiment_path))
    return False


def run(options):
    logger = get_logger()
    train_dataset, validation_dataset = get_train_and_validation(options)
    if options.debug:
        train_iterator = get_validation_iterator(options,
                                                 validation_dataset)
    else:
        train_iterator = get_train_iterator(options, train_dataset)
    validation_iterator = get_validation_iterator(
        options, validation_dataset,
        # --eval_buckets: share the train edges so eval compiles one
        # parse program per bucket, not one per exact length
        length_buckets=(train_iterator.length_buckets
                        if options.eval_buckets else None))
    embeddings = train_dataset["embeddings"]

    logger.info("Initializing model.")
    if jax.process_count() > 1:
        # multi-process: the dp mesh must span ALL global devices even if
        # each process owns just one (1-chip-per-host pods / the 2-process
        # CPU test harness)
        n_dev = options.n_devices or jax.device_count()
        mesh = make_mesh(n_dev, mp=options.mp)  # mp>1 raises: dp-only
    else:
        n_dev = options.n_devices or jax.local_device_count()
        mesh = (make_mesh(n_dev, mp=options.mp)
                if n_dev > 1 else None)
    trainer = build_trainer(options, embeddings, mesh=mesh)

    run_train(options, train_iterator, trainer, validation_iterator)


def main(args=None):
    options = parse_args(argument_parser(), args)
    if options.jax_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          options.jax_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if options.world_size:
        # explicit multi-process rendezvous (TPU pods normally self-
        # configure; this mirrors the reference's MASTER_ADDR/PORT flags)
        from cliora_tpu.parallel.multihost import initialize_multihost
        initialize_multihost(
            f"{options.master_addr}:{options.master_port}",
            options.world_size, options.local_rank)
    configure_experiment(options.experiment_path,
                         rank=jax.process_index() or None)
    logger = get_logger()
    logger.info(stringify_flags(options))
    save_flags(options, options.experiment_path)
    run(options)


if __name__ == "__main__":
    main()
