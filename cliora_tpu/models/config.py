"""Static model configuration.

Hashable dataclass closed over by jitted functions, mirroring the
reference's model flags (reference: cliora/scripts/train.py:337-345,
cliora/net/trainer.py:504-558).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    size: int = 400                 # hidden_dim
    input_size: int = 1024          # embedding width E
    # 'mlp' | 'treelstm': chart models; 'word': the chart-free word-level
    # grounding baseline (reference: cliora/net/vg.py:477-482, dead code
    # there -- selectable here, VG loss only)
    arch: str = "mlp"
    share: bool = True              # tie inside/outside compose+score fns
    normalize: str = "unit"         # 'unit' | 'none'
    compress: bool = False          # outside root = inside root @ mat
    outside: bool = True            # run the outside pass
    use_obj: bool = False           # CLIORA: visual region features
    n_regions: int = 36             # MAF regions per image
    obj_feat_size: int = 2048       # Faster-R-CNN feature width
    attn_dropout: float = 0.1       # AttentionHead dropout (cliora.py:32)
    attn_temp: float = 1.0          # AttentionHead temperature
    compute_dtype: str = "float32"  # matmul compute dtype (bfloat16 opt-in)
    # rematerialize chart levels in the backward (jax.checkpoint):
    # activations per level are recomputed instead of stored, trading
    # step time for O(n) x less live memory -- enables e.g.
    # B=128 x L=40 training that otherwise exceeds v5e HBM (BASELINE.md).
    # True/False force it; "auto" decides PER COMPILED SHAPE from a
    # trace-time activation-memory estimate (ops/chart_pass.remat_enabled)
    # -- under mixed-length bucketing the short buckets skip the ~30%
    # remat overhead while the long ones still fit HBM.
    remat: object = False           # bool | "auto"
    # HBM budget the auto policy steers under (leaves headroom for
    # params, optimizer state and the loss-side tensors on a 16 GB v5e)
    remat_budget_gb: float = 10.0
    # selective remat: only levels whose (B, L*N, D) intermediates are at
    # least this fraction of the biggest level's are checkpointed.
    # L*N = (n-level)*level is a parabola over levels, so the mid-chart
    # peak carries most of the live memory; storing the cheap shoulder
    # levels recovers most of the recompute overhead at a small memory
    # cost.  0.0 = remat every level (strict superset of the reference,
    # which has no remat at all).
    remat_frac: float = 0.0
    # what a checkpointed level stores for its backward:
    #   'full': nothing beyond the level inputs -- the whole forward
    #           (gathers, compose matmuls, scores) is recomputed;
    #   'dots': matmul (dot_general) outputs are saved
    #           (jax.checkpoint_policies.dots_saveable), so the backward
    #           recomputes only gathers + elementwise + the custom-vjp
    #           einsums.  ~2 stored (rows, D) copies per level vs ~5.6
    #           unremated vs ~0 for 'full' -- the middle point of the
    #           memory/recompute trade (measured L=40 table, BASELINE.md).
    #   'gathers': everything EXCEPT the chart-child gathers (tagged
    #           CHILD_RESIDS in ops/chart_pass.py) is saved
    #           (save_anything_except_these_names).  MEASURED NEGATIVE
    #           at L=40 B=128: 27.3 GB vs 18.2 unremated -- the policy
    #           keeps redundant elementwise residuals (pre-act + relu
    #           mask + broadcast) and the compose concat (BASELINE.md
    #           round-4 grid).  Kept for grid reproducibility.
    remat_policy: str = "full"
    # 'soft': softmax-weighted split aggregation (DIORA); 'hard': argmax
    # split only (the S-DIORA greedy variant -- selectable but never
    # shipped in the reference: cliora/net/trainer.py:525 raises)
    aggregate: str = "soft"
    # 'auto' (default): the fully fused single-dispatch VMEM-resident
    # pallas kernel on TPU backends (ties XLA wall, ~140x fewer
    # dispatches -- ops/pallas_chart.py MEASURED), XLA elsewhere
    # (interpret-mode pallas is test-only slow).  'xla' / 'pallas'
    # force one implementation; pallas routes only when
    # pallas_chart.supports() holds (text-only decode path).
    parse_impl: str = "auto"

    def __post_init__(self):
        assert self.arch in ("mlp", "treelstm", "word"), self.arch
        assert self.arch != "word" or self.use_obj, \
            "--arch word is a grounding baseline; it requires --obj_feats"
        assert self.normalize in ("unit", "none"), self.normalize
        assert self.compute_dtype in ("float32", "bfloat16")
        assert self.aggregate in ("soft", "hard"), self.aggregate
        assert self.remat in (True, False, "auto"), self.remat
        assert self.remat_policy in ("full", "dots", "gathers"), \
            self.remat_policy
        assert self.parse_impl in ("auto", "xla", "pallas"), self.parse_impl
