from cliora_tpu.chart.offsets import (
    ncells,
    level_offsets,
    cell_index,
    cell_span,
    span_to_cell,
)
from cliora_tpu.chart.indices import (
    inside_index,
    outside_index,
    outside_mask,
    inside_components,
    outside_components,
    ChartIndex,
)

__all__ = [
    "ncells",
    "level_offsets",
    "cell_index",
    "cell_span",
    "span_to_cell",
    "inside_index",
    "outside_index",
    "outside_mask",
    "inside_components",
    "outside_components",
    "ChartIndex",
]
