from cliora_tpu.analysis.eval import run_eval
from cliora_tpu.analysis.grounding import GroundingMeter, box_iou, ground_phrases
from cliora_tpu.analysis.trees import (
    F1Meter,
    bp_to_tree,
    spans_to_tree,
    tree_to_spans,
    tree_to_string,
)

__all__ = [
    "run_eval", "GroundingMeter", "box_iou", "ground_phrases",
    "F1Meter", "bp_to_tree", "spans_to_tree", "tree_to_spans",
    "tree_to_string",
]
