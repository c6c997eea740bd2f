"""Parity of the Pallas fused exact-GELU (ops/gelu.py) with the XLA path."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.ops.gelu import gelu_exact_fused


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_matches_plain_expression(dtype):
    x = jnp.asarray(np.random.RandomState(0).randn(3, 257, 128) * 3, dtype)
    xf = x.astype(jnp.float32)
    ref = (0.5 * xf * jax.lax.erfc(-xf * math.sqrt(0.5))).astype(dtype)
    got = gelu_exact_fused(x)
    assert got.shape == x.shape and got.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-3, rtol=2e-3,
    )


def test_unaligned_rows_padded_correctly():
    x = jnp.asarray(np.random.RandomState(1).randn(7, 3072), jnp.bfloat16)
    got = gelu_exact_fused(x, block_rows=4)
    xf = x.astype(jnp.float32)
    ref = (0.5 * xf * jax.lax.erfc(-xf * math.sqrt(0.5))).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-3
    )


def test_polynomial_erf_envelope():
    """Mosaic lowers no erf/erfc primitive, so kernels use XLA's own f32
    rational erf (ops/gelu.py::erf_poly_f32). Pin the envelope: <=1e-6 abs
    from lax.erf, and GELU built on it differs from the lax.erfc
    formulation only in the |gelu| < 1e-2 tail by <=5e-6 absolute."""
    from hypervla_tpu.ops.gelu import erf_poly_f32, gelu_exact_poly_f32

    x = jnp.asarray(np.linspace(-6, 6, 200_001), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(erf_poly_f32(x)), np.asarray(jax.lax.erf(x)), atol=1e-6
    )
    xb = jnp.asarray(
        np.random.RandomState(0).randn(1_000_000) * 3, jnp.bfloat16
    )
    xf = xb.astype(jnp.float32)
    ref = np.asarray(
        (0.5 * xf * jax.lax.erfc(-xf * math.sqrt(0.5))).astype(jnp.bfloat16),
        np.float32,
    )
    got = np.asarray(
        gelu_exact_poly_f32(xf).astype(jnp.bfloat16), np.float32
    )
    assert np.abs(ref - got).max() <= 5e-6
    big = np.abs(ref) > 1e-2
    np.testing.assert_array_equal(ref[big], got[big])


def test_custom_vjp_backward_unchanged():
    """The fused forward plugs into _gelu_exact's custom VJP; grads keep
    matching jax.nn.gelu autodiff."""
    from hypervla_tpu.models.encoders.dinov2 import _gelu_exact

    x = jnp.asarray(np.random.RandomState(0).randn(64, 33) * 3, jnp.bfloat16)
    g = jnp.asarray(np.random.RandomState(1).randn(64, 33), jnp.bfloat16)
    ref_grad = jax.vjp(
        lambda v: jax.nn.gelu(v, approximate=False), x.astype(jnp.float32)
    )[1](g.astype(jnp.float32))[0]
    got_grad = jax.vjp(_gelu_exact, x)[1](g)[0].astype(jnp.float32)
    assert float(jnp.abs(ref_grad - got_grad).max()) < 0.05
