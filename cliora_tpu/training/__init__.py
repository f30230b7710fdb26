from cliora_tpu.training.trainer import TrainConfig, Trainer, compute_losses
from cliora_tpu.training.checkpoint import (
    export_torch_checkpoint,
    import_torch_checkpoint,
    load_params,
    save_params,
)

__all__ = [
    "TrainConfig", "Trainer", "compute_losses",
    "export_torch_checkpoint", "import_torch_checkpoint",
    "load_params", "save_params",
]
