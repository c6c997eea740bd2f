"""Flash-attention kernel tests (interpret mode on CPU) against the XLA
reference computation."""
import jax
import jax.numpy as jnp
import numpy as np

from hypervla_tpu.ops.flash_attention import flash_attention, mha_flash
import pytest

pytestmark = pytest.mark.slow


def _reference(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bqd,bkd->bqk", q * scale, k)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


def test_flash_matches_reference_unpadded():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 128, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 64))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(out, _reference(q, k, v), atol=2e-5)


def test_flash_matches_reference_ragged_length():
    """257 tokens (DINOv2's cls+256) — exercises padding/masking."""
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(rng, (1, 257, 64))
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 257, 64))
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 257, 64))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(out, _reference(q, k, v), atol=2e-5)


def test_mha_flash_layout():
    rng = jax.random.PRNGKey(6)
    q = jax.random.normal(rng, (2, 30, 4, 16))
    k = jax.random.normal(jax.random.PRNGKey(7), (2, 30, 4, 16))
    v = jax.random.normal(jax.random.PRNGKey(8), (2, 30, 4, 16))
    out = mha_flash(q, k, v, interpret=True)
    assert out.shape == (2, 30, 4, 16)
    # reference per-head
    ref = jnp.stack(
        [
            _reference(
                q[:, :, h].reshape(2, 30, 16),
                k[:, :, h].reshape(2, 30, 16),
                v[:, :, h].reshape(2, 30, 16),
            )
            for h in range(4)
        ],
        axis=2,
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_bf16_io():
    q = jnp.ones((1, 16, 8), jnp.bfloat16)
    out = flash_attention(q, q, q, block_q=16, block_k=16, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.ones((1, 16, 8)), atol=1e-2
    )


def test_pallas_layer_norm_matches_flax():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypervla_tpu.ops.layer_norm import layer_norm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 257, 48), jnp.float32)
    scale = jnp.asarray(rng.randn(48), jnp.float32)
    bias = jnp.asarray(rng.randn(48), jnp.float32)
    got = layer_norm(x, scale, bias, eps=1e-6)
    ref = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # non-multiple row counts and bf16 output dtype
    xb = x[:1, :100].astype(jnp.bfloat16)
    got = layer_norm(xb, scale, bias, eps=1e-6)
    ref = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).apply(
        {"params": {"scale": scale, "bias": bias}}, xb
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )
