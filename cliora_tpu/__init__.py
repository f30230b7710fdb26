"""cliora_tpu: a TPU-native JAX framework with the capabilities of CLIORA/DIORA.

Re-implementation (from scratch, TPU-first) of the capabilities of the
reference PyTorch codebase bobwan1995/cliora (ICLR 2022, "Unsupervised
Vision-Language Grammar Induction with Shared Structure Modeling").

Design stance (vs. the reference):
  * The CKY-style chart is a functional value -- `(B, ncells, D)` arrays
    threaded through a traced level loop inside `jit` -- not mutable module
    state (reference: cliora/net/diora.py:7-23 mutates `Chart` tensors).
  * Per-(length, level) gather indices are closed-form numpy constants baked
    into the compiled program (reference builds them with Python loops on
    the host per level: cliora/net/inside_index.py, outside_index.py).
  * CKY argmax decoding runs on device, fused into the inside pass, with a
    single backpointer array transferred to host per batch (reference:
    cliora/analysis/cky.py runs Python loops with per-cell host syncs).
  * Multi-chip training is a data-parallel `jax.sharding.Mesh` axis with
    gradient psum over ICI (reference: torch.distributed DDP over NCCL,
    cliora/net/trainer.py:528-575).
"""

__version__ = "0.1.0"
