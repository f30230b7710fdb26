"""Export a trained model as a sealed serving bundle (jax.export).

Seals the parse step -- symbolic batch dimension, weights as a
params.npz sidecar (or baked into the StableHLO with
--export_baked_params) -- into per-length artifacts a serving host
runs with no model code (cliora_tpu/serving.py).  Usage mirrors
parse.py's model loading::

    python -m cliora_tpu.scripts.export_model \
        --data_type flickr --emb none \
        --validation_path flickr_data/flickr_test.json \
        --load_model_path exp/model.best.npz \
        --experiment_path exp_export \
        --export_lengths 10,20,40 [--export_platforms tpu,cpu]

The bundle lands in ``<experiment_path>/bundle``.  (The reference has
no export/serving path; cliora/scripts/parse.py rebuilds the torch net
from flags every run.)
"""

from __future__ import annotations

import os

from cliora_tpu.scripts.common import build_trainer, get_validation_dataset
from cliora_tpu.serving import export_parser, save_bundle
from cliora_tpu.utils.flags import argument_parser, parse_args
from cliora_tpu.utils.observability import configure_experiment, get_logger


def add_export_flags(p):
    p.add_argument("--export_lengths", default="10,20,40", type=str,
                   help="comma-separated padded sentence lengths; one "
                        "artifact per bucket, requests pad to the "
                        "smallest covering bucket.")
    p.add_argument("--export_platforms", default=None, type=str,
                   help="comma-separated lowering platforms (e.g. "
                        "'tpu,cpu') for a portable artifact; default: "
                        "current backend only.")
    p.add_argument("--export_batch", default=None, type=int,
                   help="pin the batch dimension (default: symbolic -- "
                        "any batch size at serving time).")
    p.add_argument("--export_baked_params", action="store_true",
                   help="bake the weights into every artifact as "
                        "StableHLO constants (the classic fully-sealed "
                        "form).  Default exports weights as arguments "
                        "with a params.npz sidecar: artifacts and their "
                        "cached per-shape executables stay small and "
                        "the weights upload once per process -- much "
                        "faster export, warmup, and restart-from-cache "
                        "(BASELINE.md round 5).")
    return p


def run(options):
    logger = get_logger()
    dataset = get_validation_dataset(options)
    trainer = build_trainer(options, dataset["embeddings"])

    lengths = [int(x) for x in options.export_lengths.split(",")]
    platforms = (options.export_platforms.split(",")
                 if options.export_platforms else None)
    in_args = not options.export_baked_params
    params = trainer.local_params()
    artifacts = export_parser(
        trainer.cfg, params, lengths,
        platforms=platforms, batch=options.export_batch,
        params_in_args=in_args)
    bundle = os.path.join(options.experiment_path, "bundle")
    save_bundle(bundle, trainer.cfg, artifacts,
                word2idx=dataset["word2idx"],
                batch=options.export_batch,
                params=params if in_args else None,
                extra_meta={"source_checkpoint": options.load_model_path})
    for L, blob in artifacts.items():
        logger.info(f"exported bucket L={L}: {len(blob) / 1e6:.2f} MB")
    logger.info(f"bundle written to {bundle}")
    return bundle


def main(args=None):
    options = parse_args(add_export_flags(argument_parser()), args)
    configure_experiment(options.experiment_path)
    return run(options)


if __name__ == "__main__":
    main()
