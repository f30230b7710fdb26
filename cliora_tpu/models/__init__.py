from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_params, param_count

__all__ = [
    "ModelConfig", "init_params", "param_count",
    "DioraOutput", "diora_forward", "embed_forward",
    "image_encoder_forward", "leaf_transform", "word_grounding_forward",
]

_LAZY = {
    "DioraOutput": "cliora_tpu.models.diora",
    "diora_forward": "cliora_tpu.models.diora",
    "embed_forward": "cliora_tpu.models.diora",
    "image_encoder_forward": "cliora_tpu.models.diora",
    "leaf_transform": "cliora_tpu.models.diora",
    "word_grounding_forward": "cliora_tpu.models.word_grounding",
}


def __getattr__(name):
    # lazy: models.diora imports ops.chart_pass which imports
    # models.config -- eager re-export here would be circular
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
