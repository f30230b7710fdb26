"""Compile-time HBM analysis of the train step for a given config.

Prints XLA's memory_analysis() for the compiled step -- temp (activation)
bytes, argument/output bytes -- without executing it.  Used to calibrate
the per-policy stored-activation copy factors behind ``--remat auto``
(ops/chart_pass.remat_enabled) against what the compiler actually
allocates.

Usage: python tools/mem_analysis.py '{"B":128,"L":40,"remat":true,
           "policy":"gathers","text":true}'
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    spec = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    B = spec.get("B", 128)
    L = spec.get("L", 40)
    D, E, V, K, R, F = 400, 1024, 10000, 100, 36, 2048
    text = spec.get("text", False)
    cfg = ModelConfig(size=D, input_size=E, use_obj=not text, n_regions=R,
                      obj_feat_size=F, compute_dtype="bfloat16",
                      remat=spec.get("remat", False),
                      remat_frac=spec.get("remat_frac", 0.0),
                      remat_policy=spec.get("policy", "full"))
    tc = TrainConfig(lr=5e-4, k_neg=K, vg_loss=not text,
                     use_contr=not text, emb_trainable=True,
                     attn_impl="pallas")
    trainer = Trainer.build(cfg, tc, V, seed=0)

    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(0, V, (B, L)))
    neg = jnp.asarray(rs.choice(V, K, replace=False))
    obj = jnp.asarray(rs.randn(B, R, F).astype(np.float32))
    rng = jax.random.key(0, impl="rbg")

    compiled = trainer._train_step.lower(
        trainer.state, tokens, neg, obj, rng).compile()
    ma = compiled.memory_analysis()
    out = {"B": B, "L": L, "policy": spec.get("policy", "full"),
           "remat": spec.get("remat", False), "text": text}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "_gb")] = round(v / 2 ** 30, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
