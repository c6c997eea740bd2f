"""Unit tests for the transformer stack and attention primitives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.models.attention import (
    DifferentialAttention,
    MultiHeadAttention,
)
from hypervla_tpu.models.transformer import (
    MAPHead,
    MlpBlock,
    Transformer,
    common_transformer_sizes,
)


def test_mha_matches_flax_reference():
    """Our MultiHeadAttention must agree numerically with flax's MHA given the
    same params (same layout/init), including under a boolean mask."""
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 7, 16))
    mask = jax.random.bernoulli(jax.random.PRNGKey(1), 0.8, (2, 1, 7, 7))
    mask = mask | jnp.eye(7, dtype=bool)[None, None]  # avoid fully-masked rows

    ours = MultiHeadAttention(num_heads=4,
                              kernel_init=nn.initializers.xavier_uniform())
    theirs = nn.MultiHeadDotProductAttention(
        num_heads=4, kernel_init=nn.initializers.xavier_uniform(),
        broadcast_dropout=False, deterministic=True,
    )
    params = ours.init(jax.random.PRNGKey(42), x, x, mask)
    out_ours, weights = ours.apply(params, x, x, mask, return_weights=True)
    out_theirs = theirs.apply(params, x, x, mask=mask)
    np.testing.assert_allclose(out_ours, out_theirs, atol=1e-5)
    # probabilities sum to 1 over the key axis
    np.testing.assert_allclose(weights.sum(-1), np.ones((2, 4, 7)), atol=1e-5)


def test_transformer_shapes_and_mask():
    """Masked-out tokens must not influence other positions' outputs."""
    size_kwargs = dict(
        embedding_dim=32, num_layers=2, mlp_dim=64, num_attention_heads=4,
        dropout_rate=0.0, attention_dropout_rate=0.0,
    )
    model = Transformer(**size_kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    mask = jnp.ones((2, 1, 9, 9), dtype=bool)
    # no position attends to token 8
    mask = mask.at[:, :, :, 8].set(False)
    mask = mask.at[:, :, 8, 8].set(True)
    params = model.init(jax.random.PRNGKey(1), x, mask, train=False)
    out1, _ = model.apply(params, x, mask, train=False)
    x2 = x.at[:, 8].set(123.0)
    out2, _ = model.apply(params, x2, mask, train=False)
    np.testing.assert_allclose(out1[:, :8], out2[:, :8], atol=1e-5)
    assert out1.shape == (2, 9, 32)


def test_learnable_norm_false_strips_scale_bias():
    model = Transformer(
        embedding_dim=16, num_layers=1, mlp_dim=32, num_attention_heads=2,
        learnable_norm=False,
    )
    x = jnp.ones((1, 4, 16))
    mask = jnp.ones((1, 1, 4, 4), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), x, mask, train=False)["params"]
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, _ in flat:
        keys = jax.tree_util.keystr(path)
        assert "LayerNorm" not in keys or (
            "scale" not in keys and "bias" not in keys
        ), f"LayerNorm params present despite learnable_norm=False: {keys}"


def test_differential_attention_shapes():
    model = DifferentialAttention(embed_dim=32, num_heads=2, depth=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    mask = jnp.ones((1, 1, 6, 6), dtype=bool)
    params = model.init(jax.random.PRNGKey(1), x, attn_mask=mask)
    out, attn = model.apply(params, x, attn_mask=mask)
    assert out.shape == (2, 6, 32)
    assert attn.shape == (2, 2, 6, 6)


def test_differential_attention_respects_boolean_mask():
    """Unlike the reference (which adds bools to logits), a masked position
    must have zero attention probability in both distributions."""
    model = DifferentialAttention(embed_dim=32, num_heads=2, depth=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 32))
    mask = jnp.ones((1, 1, 5, 5), dtype=bool).at[:, :, :, 4].set(False)
    params = model.init(jax.random.PRNGKey(1), x, attn_mask=mask)
    _, attn = model.apply(params, x, attn_mask=mask)
    np.testing.assert_allclose(attn[..., 4], 0.0, atol=1e-6)


def test_map_head_pools_to_readouts():
    head = MAPHead(num_heads=2, num_readouts=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = head.init(jax.random.PRNGKey(1), x, train=False)
    out = head.apply(params, x, train=False)
    assert out.shape == (2, 3, 16)


def test_common_transformer_sizes():
    dim, kwargs = common_transformer_sizes("vit_t")
    assert dim == 192 and kwargs["num_layers"] == 12 and kwargs["mlp_dim"] == 768
    with pytest.raises(AssertionError):
        common_transformer_sizes("nope")


def test_mlp_block_deterministic():
    block = MlpBlock(mlp_dim=32, dropout_rate=0.5)
    x = jnp.ones((2, 4, 16))
    params = block.init(jax.random.PRNGKey(0), x, deterministic=True)
    out1 = block.apply(params, x, deterministic=True)
    out2 = block.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(out1, out2)
