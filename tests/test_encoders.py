"""Tests for the native DINOv2 / T5 encoders: shapes, masking, param layout."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hypervla_tpu.models.encoders.dinov2 import (
    DINOv2Config,
    DINOv2Model,
    dinov2_config,
)
from hypervla_tpu.models.encoders.t5 import T5Config, T5EncoderModel, t5_config
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]

TINY_DINO = DINOv2Config(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2, patch_size=14,
    image_size=56,
)
TINY_T5 = T5Config(vocab_size=100, d_model=16, d_kv=8, d_ff=32, num_layers=2,
                   num_heads=2, dropout_rate=0.0)


def test_dinov2_named_configs():
    c = dinov2_config("facebook/dinov2-base")
    assert c.hidden_size == 768 and c.num_hidden_layers == 12
    assert c.patch_size == 14 and c.image_size == 518


def test_dinov2_shapes_and_attentions():
    model = DINOv2Model(config=TINY_DINO)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x, output_attentions=True)
    # 56/14 = 4 -> 16 patches + cls
    assert out.last_hidden_state.shape == (2, 17, 32)
    assert len(out.attentions) == 2
    assert out.attentions[0].shape == (2, 2, 17, 17)


def test_dinov2_scan_layers_matches_loop():
    """scan_layers=True (stacked params + lax.scan) must match the loop-mode
    forward bit-for-bit given converted params, both directions."""
    from hypervla_tpu.models.encoders.dinov2 import (
        stack_layer_params,
        unstack_layer_params,
    )

    loop = DINOv2Model(config=TINY_DINO)
    scan = DINOv2Model(config=TINY_DINO, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    loop_params = loop.init(jax.random.PRNGKey(1), x)["params"]
    scan_params = stack_layer_params(loop_params)

    # scan tree must match what scan-mode init produces
    ref_scan = scan.init(jax.random.PRNGKey(1), x)["params"]
    ref_struct = jax.tree_util.tree_structure(ref_scan)
    assert jax.tree_util.tree_structure(scan_params) == ref_struct

    a = loop.apply({"params": loop_params}, x).last_hidden_state
    b = scan.apply({"params": scan_params}, x).last_hidden_state
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # round trip
    back = unstack_layer_params(scan_params)
    ab = jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p), np.asarray(q)),
        loop_params, back,
    )
    del ab

    # far fewer runtime handles: the whole trunk stacks to per-layer-unique
    assert len(jax.tree_util.tree_leaves(scan_params)) < len(
        jax.tree_util.tree_leaves(loop_params)
    )


def test_dinov2_pos_interpolation_other_resolution():
    """Position grid trained at 56 (4x4) must interpolate for 84 (6x6) input."""
    model = DINOv2Model(config=TINY_DINO)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 84, 84, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.last_hidden_state.shape == (1, 37, 32)


def test_dinov2_param_tree_matches_hf_layout():
    model = DINOv2Model(config=TINY_DINO)
    x = jnp.zeros((1, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert "embeddings" in params and "encoder" in params and "layernorm" in params
    emb = params["embeddings"]
    assert set(emb.keys()) == {
        "cls_token", "mask_token", "patch_embeddings", "position_embeddings"
    }
    layer0 = params["encoder"]["layer"]["0"]
    assert set(layer0.keys()) == {
        "norm1", "attention", "layer_scale1", "norm2", "mlp", "layer_scale2"
    }
    assert set(layer0["attention"].keys()) == {"attention", "output"}
    assert set(layer0["attention"]["attention"].keys()) == {"query", "key", "value"}
    assert set(layer0["mlp"].keys()) == {"fc1", "fc2"}


def test_t5_named_configs():
    c = t5_config("t5-base")
    assert c.d_model == 768 and c.num_layers == 12 and c.num_heads == 12


def test_t5_encoder_shapes_and_mask():
    model = T5EncoderModel(config=TINY_T5)
    ids = jnp.array([[5, 6, 7, 1, 0, 0]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (1, 6, 16)
    # padding tokens must not affect non-padded outputs
    ids2 = ids.at[0, 4].set(99)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(out[:, :4], out2[:, :4], atol=1e-5)


def test_t5_relative_bias_only_in_block0():
    model = T5EncoderModel(config=TINY_T5)
    ids = jnp.zeros((1, 4), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    assert "relative_attention_bias" in params["block_0"]["layer_0_SelfAttention"]
    assert "relative_attention_bias" not in params["block_1"]["layer_0_SelfAttention"]
