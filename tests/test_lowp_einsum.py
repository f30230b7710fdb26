"""lowp_einsum (ops/core.py): the compute-dtype einsum custom VJP must be
gradient-identical to plain einsum at f32 and direction-preserving at
bf16, across every pattern the chart passes use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.ops.core import lowp_einsum

# every pattern used by bilinear / weighted-agg / region attention
PATTERNS = [
    ("...me,ed->...md", (3, 7, 5), (5, 5)),
    ("...md,...md->...m", (3, 7, 5), (3, 7, 5)),
    ("blnd,bln->bld", (2, 4, 3, 5), (2, 4, 3)),
    ("bnld,bnl->bld", (2, 3, 4, 5), (2, 3, 4)),
    ("bld,brd->blr", (2, 4, 5), (2, 3, 5)),
    ("blr,brd->bld", (2, 4, 3), (2, 3, 5)),
]


def _loss(fn, w):
    return lambda x, y: jnp.sum(jnp.tanh(fn(x, y)) * w)


@pytest.mark.parametrize("pattern,xs,ys", PATTERNS)
def test_f32_grads_match_plain_einsum(pattern, xs, ys, rng):
    x = jnp.asarray(rng.randn(*xs).astype(np.float32))
    y = jnp.asarray(rng.randn(*ys).astype(np.float32))
    out = lowp_einsum(pattern, x, y)
    ref = jnp.einsum(pattern, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    w = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    g_lo = jax.grad(_loss(lambda a, b: lowp_einsum(pattern, a, b), w),
                    argnums=(0, 1))(x, y)
    g_ref = jax.grad(_loss(lambda a, b: jnp.einsum(pattern, a, b), w),
                     argnums=(0, 1))(x, y)
    for a, b in zip(g_lo, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pattern,xs,ys", PATTERNS)
def test_bf16_grads_finite_and_aligned(pattern, xs, ys, rng):
    xf = jnp.asarray(rng.randn(*xs).astype(np.float32))
    yf = jnp.asarray(rng.randn(*ys).astype(np.float32))
    x16 = xf.astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(
        *lowp_einsum(pattern, xf, yf).shape).astype(np.float32))

    def lo(a, b):
        return lowp_einsum(pattern, a, b, jnp.bfloat16)

    gx16, gy = jax.grad(_loss(lo, w), argnums=(0, 1))(x16, yf)
    # cotangent dtypes mirror primal dtypes
    assert gx16.dtype == jnp.bfloat16
    assert gy.dtype == jnp.float32
    gx_ref, gy_ref = jax.grad(
        _loss(lambda a, b: jnp.einsum(pattern, a, b), w),
        argnums=(0, 1))(xf, yf)
    for a, b in [(gx16, gx_ref), (gy, gy_ref)]:
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.all(np.isfinite(a))
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.99, (pattern, cos)


def test_out_dtype_controls_output_and_cotangent_cast(rng):
    x = jnp.asarray(rng.randn(2, 4, 3, 5).astype(np.float32)).astype(
        jnp.bfloat16)
    p = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32))
    out16 = lowp_einsum("blnd,bln->bld", x, p, jnp.bfloat16, jnp.bfloat16)
    assert out16.dtype == jnp.bfloat16
    out32 = lowp_einsum("blnd,bln->bld", x, p, jnp.bfloat16)
    assert out32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), rtol=2e-2, atol=2e-2)
