"""Profile the production train step on the real chip and attribute time
per compiled fusion (jax.profiler trace joined with HLO metadata).

Usage::

    python tools/profile_step.py [--steps 20] [--top 30] [--hlo]

Prints the top-N device ops by total time, with the HLO ``op_name``
metadata (source-level einsum/op labels) resolved for fusions when
``--hlo`` is given.  This is the tool behind BASELINE.md's ms-level
walks; see CLAUDE.md round-2 findings for the recipe.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build(B=128, L=20):
    from cliora_tpu.models.config import ModelConfig
    from cliora_tpu.training.trainer import TrainConfig, Trainer

    D, E, V, K, R, F = 400, 1024, 10000, 100, 36, 2048
    cfg = ModelConfig(size=D, input_size=E, use_obj=True, n_regions=R,
                      obj_feat_size=F, compute_dtype="bfloat16")
    tc = TrainConfig(lr=5e-4, k_neg=K, vg_loss=True, use_contr=True,
                     emb_trainable=True, attn_impl="pallas")
    trainer = Trainer.build(cfg, tc, V, seed=0)
    rs = np.random.RandomState(0)
    import jax.numpy as jnp
    args = (jnp.asarray(rs.randint(0, V, (B, L))),
            jnp.asarray(rs.choice(V, K, replace=False)),
            jnp.asarray(rs.randn(B, R, F).astype(np.float32)),
            jax.random.key(0, impl="rbg"))
    return trainer, args


def device_op_times(trace_dir):
    """{op display name: total us} summed over device-track events."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # the per-op device track is the thread named "XLA Ops" on the
    # /device:TPU process
    op_tracks = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            op_tracks.add((e["pid"], e.get("tid")))
    totals = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tracks
                and e.get("dur") is not None):
            totals[e["name"]] += e["dur"]
            counts[e["name"]] += 1
    return totals, counts


def hlo_op_names(trainer, args):
    """fusion name -> set of op_name metadata labels inside it."""
    txt = trainer._train_step.lower(trainer.state, *args).compile().as_text()
    comp_ops = collections.defaultdict(set)
    current = None
    for line in txt.splitlines():
        if line.lstrip().startswith(("ENTRY", "%fused", "fused")) or (
                "{" in line and ("computation" in line or line.startswith(
                    ("%", "ENTRY")))):
            m2 = re.match(r"\s*%?([\w.\-]+)", line)
            if m2:
                current = m2.group(1)
        for om in re.finditer(r'op_name="([^"]+)"', line):
            if current:
                comp_ops[current].add(om.group(1))
    return comp_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--length", type=int, default=20)
    args_ns = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    trainer, args = build(args_ns.batch, args_ns.length)
    state = trainer.state
    for _ in range(5):
        state, metrics = trainer._train_step(state, *args)
    float(metrics["total_loss"])

    trace_dir = tempfile.mkdtemp(prefix="cliora_prof_")
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for _ in range(args_ns.steps):
            state, metrics = trainer._train_step(state, *args)
        float(metrics["total_loss"])
    wall = (time.time() - t0) / args_ns.steps * 1e3
    print(f"wall per step: {wall:.2f} ms")

    totals, counts = device_op_times(trace_dir)
    grand = sum(totals.values()) / 1e3 / args_ns.steps
    print(f"device total: {grand:.2f} ms/step over {args_ns.steps} steps")
    comp_ops = hlo_op_names(trainer, args) if args_ns.hlo else {}
    for name, us in totals.most_common(args_ns.top):
        ms = us / 1e3 / args_ns.steps
        label = ""
        for key, ops in comp_ops.items():
            if name.startswith(key):
                label = " | ".join(sorted(ops))[:120]
                break
        print(f"{ms:8.3f} ms  x{counts[name] // args_ns.steps:<4d}"
              f" {name[:60]:60s} {label}")


if __name__ == "__main__":
    main()
