"""Parameter initialization.

Parameter pytrees use torch naming/layout conventions (linear weights are
``(out, in)``) so reference checkpoints map 1:1 (training/checkpoint.py).

Init parity with the reference: every trainable diora/embed/recon parameter
is drawn from N(0, 1) -- the reference calls ``param.data.normal_()`` on
everything after construction (cliora/net/diora.py:234-237,
cliora/net/trainer.py:214-217,41-44) -- and the ImageEncoder is then
re-zeroed ("keep same with MAF", cliora/net/utils.py:45-50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cliora_tpu.models.config import ModelConfig


def _normal(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


def _init_linear(key, out_dim, in_dim):
    kw, kb = jax.random.split(key)
    return {"w": _normal(kw, (out_dim, in_dim)), "b": _normal(kb, (out_dim,))}


def _init_compose(key, cfg: ModelConfig, leaf: bool):
    D = cfg.size
    keys = jax.random.split(key, 4)
    if cfg.arch == "treelstm":
        # Scaled init (not N(0,1)): a unit-variance 5D x 2D gate matrix
        # saturates every sigmoid/tanh and kills gradients; the reference
        # never ships a TreeLSTM so there is no parity constraint here.
        scale = 1.0 / np.sqrt(2 * D)
        cp = {
            "W": _normal(keys[0], (5 * D, 2 * D)) * scale,
            "b": jnp.zeros((5 * D,), jnp.float32),
        }
        if leaf:
            cp["leaf_fc"] = _init_linear(keys[1], D, D)
            cp["leaf_fc_c"] = _init_linear(keys[2], D, D)
        return cp
    cp = {
        "fc0": _init_linear(keys[0], D, 2 * D),
        "fc1": _init_linear(keys[1], D, D),
    }
    if leaf:
        cp["leaf_fc"] = _init_linear(keys[2], D, D)
    return cp


def init_diora_params(key, cfg: ModelConfig):
    """(reference: cliora/net/diora.py:453-471 ``DioraMLP.init_parameters``)"""
    D = cfg.size
    keys = jax.random.split(key, 6)
    dp = {
        "inside_compose": _init_compose(keys[0], cfg, leaf=True),
        "inside_score": {"mat": _normal(keys[1], (D, D))},
    }
    if not cfg.share:
        dp["outside_compose"] = _init_compose(keys[2], cfg, leaf=False)
        dp["outside_score"] = {"mat": _normal(keys[3], (D, D))}
    if cfg.compress:
        dp["root_mat_out"] = _normal(keys[4], (D, D))
    else:
        dp["root_vector_out_h"] = _normal(keys[4], (D,))
    return dp


def init_embed_params(key, cfg: ModelConfig, embeddings):
    """Word embedding table + two projections (span / word).

    (reference: cliora/net/trainer.py:204-224 ``Embed``)

    Args:
      embeddings: (V, E) numpy array of pretrained vectors, or an int V to
        create a trainable table ~ N(0,1) (the ``--emb none`` path,
        cliora/data/embeddings.py:164 / torch.nn.Embedding default init).
    """
    D = cfg.size
    k_emb, k_mat, k_mat1 = jax.random.split(key, 3)
    if isinstance(embeddings, (int, np.integer)):
        table = _normal(k_emb, (int(embeddings), cfg.input_size))
    else:
        table = jnp.asarray(np.asarray(embeddings), dtype=jnp.float32)
        assert table.shape[1] == cfg.input_size, (
            table.shape, cfg.input_size)
    return {
        "embeddings": table,
        "mat": _normal(k_mat, (D, cfg.input_size)),
        "mat1": _normal(k_mat1, (D, cfg.input_size)),
    }


def init_image_encoder_params(cfg: ModelConfig):
    """Zero-initialized region-feature projections.

    (reference: cliora/net/utils.py:37-55 ``ImageEncoder``)
    """
    D, F = cfg.size, cfg.obj_feat_size
    z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    return {
        "fc": {"w": z(D, F), "b": z(D)},
        "fc_vis": {"w": z(D, F), "b": z(D)},
    }


def init_recon_params(key, cfg: ModelConfig):
    """(reference: cliora/net/trainer.py:25-44 ReconstructionSoftmaxLoss)"""
    return {"mat": _normal(key, (cfg.size, cfg.input_size))}


def init_params(key, cfg: ModelConfig, embeddings):
    """Full Net parameter tree (reference: cliora/net/trainer.py:227-241)."""
    k_embed, k_diora, k_recon = jax.random.split(key, 3)
    params = {"embed": init_embed_params(k_embed, cfg, embeddings)}
    if cfg.arch != "word":  # the word-level baseline is chart-free
        params["diora"] = init_diora_params(k_diora, cfg)
        params["reconstruct"] = init_recon_params(k_recon, cfg)
    if cfg.use_obj:
        params["img_encoder"] = init_image_encoder_params(cfg)
    return params


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
