from cliora_tpu.ops.chart_pass import InsideOut, inside_pass, outside_pass, run_chart
from cliora_tpu.ops.core import (
    bilinear,
    compose_mlp,
    compose_treelstm,
    leaf_mlp,
    normalize,
    region_attention,
    unit_norm,
)
from cliora_tpu.ops.span_region import span_region_max

__all__ = [
    "InsideOut", "inside_pass", "outside_pass", "run_chart",
    "bilinear", "compose_mlp", "compose_treelstm", "leaf_mlp",
    "normalize", "region_attention", "unit_norm", "span_region_max",
]
