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


def test_gelu_exact_custom_vjp_matches_autodiff():
    """The bf16-residual exact gelu matches jax.nn.gelu fwd+bwd within bf16
    rounding, and a bf16 trunk's grads stay close to the fp32 trunk's."""
    from hypervla_tpu.models.encoders.dinov2 import _gelu_exact

    x = jnp.asarray(np.random.RandomState(0).randn(64, 33) * 3, jnp.bfloat16)
    ref = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
    got = _gelu_exact(x).astype(jnp.float32)
    assert float(jnp.abs(ref - got).max()) < 0.02

    g = jnp.asarray(np.random.RandomState(1).randn(64, 33), jnp.bfloat16)
    ref_grad = jax.vjp(
        lambda v: jax.nn.gelu(v, approximate=False), x.astype(jnp.float32)
    )[1](g.astype(jnp.float32))[0]
    got_grad = jax.vjp(_gelu_exact, x)[1](g)[0].astype(jnp.float32)
    assert float(jnp.abs(ref_grad - got_grad).max()) < 0.05


def test_dinov2_bf16_custom_gelu_grads_match_default_vjp(monkeypatch):
    """End-to-end: the bf16 trunk's grads with the memory-lean custom gelu
    VJP match the same bf16 trunk using jax's default gelu autodiff — the
    residual-dtype change must not move training numerics."""
    from hypervla_tpu.models.encoders import dinov2 as dinov2_mod

    rng = jax.random.PRNGKey(0)
    pixels = jax.random.normal(rng, (2, 56, 56, 3))
    m16 = DINOv2Model(config=TINY_DINO, dtype=jnp.bfloat16)
    params = m16.init(rng, pixels)["params"]

    def loss(p, x):
        out = m16.apply({"params": p}, x)
        return (out.last_hidden_state ** 2).mean()

    l_custom, g_custom = jax.value_and_grad(loss)(params, pixels)

    # same model, default autodiff through the fp32-promoted gelu
    monkeypatch.setattr(
        dinov2_mod, "_gelu_exact",
        lambda x: jax.nn.gelu(
            x.astype(jnp.float32), approximate=False
        ).astype(x.dtype),
    )
    l_ref, g_ref = jax.value_and_grad(loss)(params, pixels)

    assert np.isfinite(float(l_custom))
    assert abs(float(l_custom) - float(l_ref)) < 1e-3 * (
        abs(float(l_ref)) + 1e-6
    )
    flat_c = jnp.concatenate(
        [jnp.ravel(v) for v in jax.tree_util.tree_leaves(g_custom)]
    )
    flat_r = jnp.concatenate(
        [jnp.ravel(v) for v in jax.tree_util.tree_leaves(g_ref)]
    )
    cos = jnp.dot(flat_c, flat_r) / (
        jnp.linalg.norm(flat_c) * jnp.linalg.norm(flat_r) + 1e-12
    )
    assert float(cos) > 0.999


def test_dinov2_remat_policy_matches_no_remat():
    """remat_policy='dots' must not change values or grads (pure recompute)."""
    rng = jax.random.PRNGKey(0)
    pixels = jax.random.normal(rng, (2, 56, 56, 3))
    base = DINOv2Model(config=TINY_DINO, dtype=jnp.bfloat16)
    rem = DINOv2Model(
        config=TINY_DINO, dtype=jnp.bfloat16, remat_policy="dots"
    )
    params = base.init(rng, pixels)["params"]

    def loss(model, p):
        return (model.apply({"params": p}, pixels).last_hidden_state ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(params)
    assert abs(float(l0) - float(l1)) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-4
        ),
        g0,
        g1,
    )


def test_dot_layer_norm_matches_nn_layer_norm():
    """The MXU ones-dot LayerNorm matches flax nn.LayerNorm within bf16
    rounding (serving-only variant, fused_ln='dot')."""
    import flax.linen as nn

    from hypervla_tpu.models.encoders.dinov2 import _DotLayerNorm

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 257, 768) * 2, jnp.bfloat16
    )
    params = {
        "params": {
            "scale": jnp.asarray(
                np.random.RandomState(1).rand(768) + 0.5, jnp.float32
            ),
            "bias": jnp.asarray(
                np.random.RandomState(2).randn(768) * 0.1, jnp.float32
            ),
        }
    }
    got = _DotLayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).apply(
        params, x
    ).astype(jnp.float32)
    ref = nn.LayerNorm(epsilon=1e-6).apply(params, x.astype(jnp.float32))
    assert float(jnp.abs(got - ref).max()) < 0.05
