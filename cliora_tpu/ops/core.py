"""Primitive ops shared by the inside and outside passes.

All functions are pure; parameters are plain pytrees whose linear weights
use the torch ``(out_features, in_features)`` layout so that checkpoints
interoperate with the reference state_dicts (see training/checkpoint.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TINY = 1e-8


def unit_norm(x, eps: float = TINY):
    """L2-normalize the last dim, clamping the norm at ``eps``.

    (reference: cliora/net/utils.py:11-14 ``UnitNorm``)
    """
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def normalize(mode: str, x):
    """(reference: cliora/net/utils.py:17-27 ``NormalizeFunc``)"""
    if mode == "unit":
        return unit_norm(x)
    return x


def linear(p, x):
    """``x @ w.T + b`` with torch-layout weight ``w: (out, in)``."""
    return x @ p["w"].T + p["b"]


def leaf_mlp(cp, x):
    """Leaf transform ``tanh(leaf_fc(x))``.

    (reference: cliora/net/diora.py:58-63)
    """
    return jnp.tanh(linear(cp["leaf_fc"], x))


def compose_mlp(cp, left_h, right_h, compute_dtype=jnp.float32):
    """Two-layer ReLU MLP over the concatenated children.

    ``h = relu(W2 relu(W1 [l; r] + b1) + b2)``
    (reference: cliora/net/diora.py:35-40,65-72)
    """
    x = jnp.concatenate([left_h, right_h], axis=-1).astype(compute_dtype)
    h = jax.nn.relu(linear(jax.tree.map(lambda t: t.astype(compute_dtype), cp["fc0"]), x))
    h = jax.nn.relu(linear(jax.tree.map(lambda t: t.astype(compute_dtype), cp["fc1"]), h))
    return h.astype(jnp.float32)


def bilinear(mat, a, b, compute_dtype=jnp.float32):
    """Split-compatibility score ``s = a^T M b`` per row.

    The (M, D) x (D, D) matmul runs in ``compute_dtype`` (bf16 rides the
    MXU at full rate) with f32 accumulation; the elementwise product and
    lane reduction stay f32.
    (reference: cliora/net/diora.py:77-97 ``Bilinear``)
    """
    am = jnp.matmul(a.astype(compute_dtype), mat.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
    return jnp.sum(am * b, axis=-1)


def region_attention(h, obj, *, temp=1.0, dropout=0.0, rng=None, train=False,
                     compute_dtype=jnp.float32):
    """Single-head cross-attention from span vectors to object regions.

    Per-example only (the reference computes a B x B einsum and takes the
    diagonal -- cliora/net/cliora.py:35-42; on TPU we compute just the
    diagonal).  No learned projections: q/k/v are used raw.

    Args:
      h:   (B, L, D) query span vectors.
      obj: (B, R, D) region embeddings (keys == values).
    Returns:
      cxt: (B, L, D) attended visual context.
    """
    score = jnp.einsum("bld,brd->blr", h.astype(compute_dtype),
                       obj.astype(compute_dtype),
                       preferred_element_type=jnp.float32) / temp
    prob = jax.nn.softmax(score, axis=-1)
    if train and dropout > 0.0:
        assert rng is not None, "dropout requires an rng key"
        keep = jax.random.bernoulli(rng, 1.0 - dropout, prob.shape)
        prob = jnp.where(keep, prob / (1.0 - dropout), 0.0)
    return jnp.einsum("blr,brd->bld", prob.astype(compute_dtype),
                      obj.astype(compute_dtype),
                      preferred_element_type=jnp.float32)


def compose_treelstm(cp, left, right, compute_dtype=jnp.float32):
    """Binary TreeLSTM composition (DIORA paper variant).

    The reference repo only ships the MLP arch (cliora/net/trainer.py:518-526
    raises for others); this implements the TreeLSTM composition from the
    DIORA lineage as a first-class alternative (BASELINE.json config 2).

    Args:
      cp: params with 'W' (5D x 2D), 'b' (5D,) torch-layout.
      left/right: tuples (h, c) each (..., D).
    Returns: (h, c)
    """
    lh, lc = left
    rh, rc = right
    x = jnp.concatenate([lh, rh], axis=-1).astype(compute_dtype)
    gates = x @ cp["W"].T.astype(compute_dtype) + cp["b"].astype(compute_dtype)
    i, fl, fr, o, g = jnp.split(gates, 5, axis=-1)
    c = (
        jax.nn.sigmoid(i) * jnp.tanh(g)
        + jax.nn.sigmoid(fl) * lc.astype(compute_dtype)
        + jax.nn.sigmoid(fr) * rc.astype(compute_dtype)
    )
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h.astype(jnp.float32), c.astype(jnp.float32)
