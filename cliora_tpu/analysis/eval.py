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
    """
    f1 = F1Meter()
    grounding = GroundingMeter()

    for batch_map in iterator.get_iterator(random_seed=seed):
        length = batch_map["length"]
        if length <= 2:
            continue
        res, _ = trainer.parse(batch_map, compute_loss=False,
                               outside=use_obj)
        real = batch_map.get("real_size", batch_map["batch_size"])

        if use_obj and "atten_score" in res:
            targets = batch_map["VG_GT"]
            boxes = np.asarray(batch_map["boxes"])
            for bid in range(real):
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
            for bid, (tree, pred_spans) in enumerate(
                    eval_batch_trees(res["cky_bp"][:real], length,
                                     batch_map.get("padded_length"))):
                gold_spans = set(gt[bid][:-1])
                f1.update(pred_spans, gold_spans)

    return {
        "corpus_f1": f1.corpus_f1,
        "sent_f1": f1.sent_f1,
        "grounding_acc": grounding.recall,
    }
