"""Validation-loop evaluation: parse F1 + phrase grounding.

(reference: cliora/scripts/train.py:119-219 ``run_eval``)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cliora_tpu.analysis.grounding import GroundingMeter, ground_phrases
from cliora_tpu.analysis.trees import F1Meter, decode_batch


def eval_batch_trees(bp: np.ndarray, length: int, padded_length=None):
    """Backpointer rows -> (tree, pred_span_set) per example; the root span
    is dropped for F1, as the reference does
    (scripts/train.py:187-189).  ``padded_length`` decodes from a padded
    length-bucket chart (layout ``padded_length``, root at ``length``)."""
    n = padded_length or length
    lengths = np.full(len(bp), length, dtype=np.int32)
    return [(tree, set(spans[:-1]))
            for tree, spans in decode_batch(bp, n, lengths)]


def run_eval(trainer, iterator, seed: int = 11,
             use_obj: bool = False) -> Dict[str, float]:
    """corpus_f1 / sent_f1 / grounding recall over a validation iterator.

    Sentences of length <= 2 are skipped, matching the reference
    (scripts/train.py:153-154).

    Under a multi-process mesh the eval is DISTRIBUTED: every process
    decodes a round-robin share of the validation batches on its local
    param replica, and the F1/grounding counters are summed across
    processes (allgather) -- metrics are identical to a chief-only pass
    over the full set (tests/test_multihost.py) but the wall-clock
    divides by the process count, instead of every non-chief process
    idling through eval (the reference evals on rank 0 only,
    cliora/scripts/train.py:105).  All processes must call this
    together (the counter reduction is a collective); each returns the
    same metrics dict.
    """
    f1 = F1Meter()
    grounding = GroundingMeter()
    multiproc = bool(getattr(trainer, "multiprocess", False))
    if multiproc:
        import jax
        pidx, pcnt = jax.process_index(), jax.process_count()
    k = 0

    for batch_map in iterator.get_iterator(random_seed=seed):
        length = batch_map["length"]
        if length <= 2:
            continue
        if multiproc:
            # round-robin over the evaluable batches: the validation
            # iterator is deliberately unchunked (data/dataset.py), so
            # each process sees the same sequence and takes every
            # pcnt-th full batch
            mine = (k % pcnt) == pidx
            k += 1
            if not mine:
                continue
        res, _ = trainer.parse(batch_map, compute_loss=False,
                               outside=use_obj)
        real = batch_map.get("real_size", batch_map["batch_size"])
        # ragged (mixed-bucket) batches carry per-example lengths;
        # uniform batches share the scalar true length
        lens = batch_map.get("lengths")
        lens = (np.full(real, length, np.int32) if lens is None
                else np.asarray(lens[:real], np.int32))

        if use_obj and "atten_score" in res:
            targets = batch_map["VG_GT"]
            boxes = np.asarray(batch_map["boxes"])
            for bid in range(real):
                if lens[bid] <= 2:
                    continue  # reference skip, per row when ragged
                phrases, _noun_mask = targets[bid]
                if not phrases:
                    continue
                ground_res = ground_phrases(
                    res["atten_score"][bid], boxes[bid], phrases)
                grounding.update(ground_res)

        # F1 needs gold spans; plain-text/jsonl corpora carry none
        # (the reference only ever evals coco/flickr, which always do --
        # scripts/train.py:185-189), so eval then reports losses-only 0s
        gt = batch_map.get("GT")
        if "cky_bp" in res and gt is not None:
            # cky_bp absent for the chart-free --arch word
            n = batch_map.get("padded_length") or length
            for bid, (tree, spans) in enumerate(
                    decode_batch(res["cky_bp"][:real], n, lens)):
                if lens[bid] <= 2:
                    continue  # reference skip, per row when ragged
                pred_spans = set(spans[:-1])  # drop root (train.py:187)
                gold_spans = set(gt[bid][:-1])
                f1.update(pred_spans, gold_spans)

    if multiproc:
        from jax.experimental import multihost_utils

        # sum the raw counters across processes; every process computes
        # the same final metrics from the global totals
        vec = np.asarray([f1.tp, f1.fp, f1.fn,
                          float(np.sum(f1.sent)), len(f1.sent),
                          grounding.total, grounding.recalled,
                          grounding.ccr], np.float64)
        tot = np.asarray(
            multihost_utils.process_allgather(vec)).sum(axis=0)
        tp, fp, fn, sent_sum, sent_n, g_tot, g_rec, g_ccr = tot
        prec = tp / max(tp + fp, 1.0)
        reca = tp / max(tp + fn, 1.0)
        return {
            "corpus_f1": (0.0 if prec + reca == 0
                          else 2 * prec * reca / (prec + reca)),
            "sent_f1": float(sent_sum / sent_n) if sent_n else 0.0,
            "grounding_acc": float(g_rec / (g_tot + 1e-8)),
            "ccra": float(g_ccr / (g_tot + 1e-8)),
        }
    return {
        "corpus_f1": f1.corpus_f1,
        "sent_f1": f1.sent_f1,
        "grounding_acc": grounding.recall,
        "ccra": grounding.ccra,
    }
