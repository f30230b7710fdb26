"""Primitive ops shared by the inside and outside passes.

All functions are pure; parameters are plain pytrees whose linear weights
use the torch ``(out_features, in_features)`` layout so that checkpoints
interoperate with the reference state_dicts (see training/checkpoint.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

TINY = 1e-8


def unit_norm(x, eps: float = TINY):
    """L2-normalize the last dim, clamping the norm at ``eps``.

    For low-precision inputs the squared sum accumulates in f32 and the
    reciprocal norm is rounded once, so the result stays in ``x.dtype``
    (keeps the bf16 chart level-loop convert-free).
    (reference: cliora/net/utils.py:11-14 ``UnitNorm``)
    """
    if x.dtype == jnp.float32:
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, eps)
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = 1.0 / jnp.maximum(jnp.sqrt(ss), eps)
    return x * scale.astype(x.dtype)


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


def compose_mlp(cp, left_h, right_h, compute_dtype=jnp.float32,
                out_dtype=jnp.float32, residual_name=None):
    """Two-layer ReLU MLP over the concatenated children.

    ``h = relu(W2 relu(W1 [l; r] + b1) + b2)``
    (reference: cliora/net/diora.py:35-40,65-72)

    ``out_dtype``: callers that keep their charts in the compute dtype
    (ops/chart_pass.py with bf16 storage) pass ``compute_dtype`` here so
    no f32 round-trip is materialized between levels.

    ``residual_name``: checkpoint-name tag on the (rows, 2D) concat for
    the named remat policy (ops/chart_pass.py remat_policy='gathers').
    Note the tag does NOT stop the concat being stored: partial eval
    saves the pre-name concat output for fc0's weight gradient anyway
    (part of why that policy measured negative, BASELINE.md).
    """
    x = jnp.concatenate([left_h, right_h], axis=-1).astype(compute_dtype)
    if residual_name is not None:
        x = checkpoint_name(x, residual_name)
    h = jax.nn.relu(linear(jax.tree.map(lambda t: t.astype(compute_dtype), cp["fc0"]), x))
    h = jax.nn.relu(linear(jax.tree.map(lambda t: t.astype(compute_dtype), cp["fc1"]), h))
    return h.astype(out_dtype)


def _einsum_bwd_patterns(pattern: str):
    ins, out = pattern.split("->")
    a, b = ins.split(",")
    return f"{out},{b}->{a}", f"{a},{out}->{b}"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def lowp_einsum(pattern, x, y, compute_dtype=jnp.float32,
                out_dtype=jnp.float32):
    """Two-operand einsum computed in ``compute_dtype``, accumulated into
    ``out_dtype``, whose *backward* also runs in ``compute_dtype``.

    Plain autodiff of a mixed-dtype einsum materializes f32 copies of the
    big bf16 operands in the transpose (the convert_element_type traffic
    was ~8 ms of the B=128 L=20 D=400 train step).  Here each cotangent is
    produced directly in the operand's own dtype: the incoming cotangent
    is cast down once, and only f32 operands (typically weights / softmax
    probabilities) get f32-accumulated gradients.  For f32 inputs the
    numerics are identical to the plain einsum.
    """
    return jnp.einsum(pattern, x.astype(compute_dtype),
                      y.astype(compute_dtype),
                      preferred_element_type=out_dtype)


def _lowp_einsum_fwd(pattern, x, y, compute_dtype, out_dtype):
    return lowp_einsum(pattern, x, y, compute_dtype, out_dtype), (x, y)


def _expand_to(x, core_x: str, core_out: str, n_lead: int):
    """Insert size-1 axes so ``x`` (indices ``core_x``, after ``n_lead``
    leading batch dims) broadcasts against ``core_out``-indexed arrays.
    ``core_x`` must be an ordered subsequence of ``core_out``."""
    for i, ch in enumerate(core_out):
        if ch not in core_x:
            x = jnp.expand_dims(x, n_lead + i)
    return x


def _einsum_or_bcast(pat, u, v, want_dtype):
    """``einsum(pat, u, v)`` -- but as an elementwise broadcast multiply
    when the pattern contracts nothing (XLA lowers a contraction-free
    einsum to a degenerate dot_general, ~3.7 ms/step slower than the VPU
    multiply for the bilinear backward at B=128)."""
    ins, out = pat.split("->")
    a, b = ins.split(",")
    contracted = set(a + b) - set(out) - {"."}
    ca, cb, co = (s.replace("...", "") for s in (a, b, out))

    def subseq(s, t):
        it = iter(t)
        return all(ch in it for ch in s)

    if not contracted and subseq(ca, co) and subseq(cb, co):
        prod = (_expand_to(u, ca, co, u.ndim - len(ca))
                * _expand_to(v, cb, co, v.ndim - len(cb)))
        return prod.astype(want_dtype)
    return jnp.einsum(pat, u, v, preferred_element_type=want_dtype)


def _lowp_einsum_bwd(pattern, compute_dtype, out_dtype, res, g):
    x, y = res
    dx_pat, dy_pat = _einsum_bwd_patterns(pattern)
    g16 = g.astype(compute_dtype)
    dx = _einsum_or_bcast(dx_pat, g16, y.astype(compute_dtype), x.dtype)
    dy = _einsum_or_bcast(dy_pat, x.astype(compute_dtype), g16, y.dtype)
    return dx.astype(x.dtype), dy.astype(y.dtype)


lowp_einsum.defvjp(_lowp_einsum_fwd, _lowp_einsum_bwd)


def bilinear(mat, a, b, compute_dtype=jnp.float32):
    """Split-compatibility score ``s = a^T M b`` per row.

    Both contractions run in ``compute_dtype`` (bf16 rides the MXU at
    full rate) and each accumulates in f32 inside the MXU, but the
    intermediate ``a @ M`` projection is *stored* in the compute dtype
    before the second contraction -- in bf16 mode the score path takes
    one bf16 rounding there (validated at cosine-level tolerance,
    tests/test_bf16.py).  The backward stays in the compute dtype too
    (``lowp_einsum``).
    (reference: cliora/net/diora.py:77-97 ``Bilinear``)
    """
    am = lowp_einsum("...me,ed->...md", a, mat, compute_dtype,
                     compute_dtype)
    return lowp_einsum("...md,...md->...m", am, b, compute_dtype)


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
    score = lowp_einsum("bld,brd->blr", h, obj, compute_dtype) / temp
    prob = jax.nn.softmax(score, axis=-1)
    if train and dropout > 0.0:
        assert rng is not None, "dropout requires an rng key"
        keep = jax.random.bernoulli(rng, 1.0 - dropout, prob.shape)
        prob = jnp.where(keep, prob / (1.0 - dropout), 0.0)
    # context comes back in the caller's h dtype: the residual add and
    # re-norm then stay convert-free in the bf16 chart level loop
    return lowp_einsum("blr,brd->bld", prob, obj, compute_dtype, h.dtype)


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
