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
