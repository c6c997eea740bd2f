"""Native encoder parity vs HuggingFace's Flax implementations.

Our DINOv2/T5 encoders claim HF-compatible param trees and matching forward
math (so real pretrained checkpoints convert 1:1). transformers' Flax models
are importable here, so this is tested directly: init the HF model on a tiny
config, load ITS params into OUR model, outputs must agree to ~1e-5."""
import jax
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]

transformers = pytest.importorskip("transformers")


def test_dinov2_matches_hf_flax():
    try:
        from transformers import Dinov2Config as HFDinov2Config
        from transformers import FlaxDinov2Model
    except ImportError:
        pytest.skip("transformers has no Flax Dinov2")

    from hypervla_tpu.models.encoders.dinov2 import DINOv2Config, DINOv2Model

    hf_config = HFDinov2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        mlp_ratio=4,
        patch_size=14,
        image_size=56,
        layerscale_value=1.0,
    )
    hf = FlaxDinov2Model(hf_config, seed=0)

    ours = DINOv2Model(
        config=DINOv2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            patch_size=14, image_size=56,
        )
    )
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3)),
        np.float32,
    )
    # HF is NCHW; ours is NHWC
    hf_out = hf(np.transpose(x, (0, 3, 1, 2)), params=hf.params)
    our_params = jax.tree_util.tree_map(lambda p: p, hf.params)
    out = ours.apply({"params": our_params}, x)
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        np.asarray(hf_out.last_hidden_state),
        atol=2e-5,
    )


def test_t5_matches_hf_flax():
    try:
        from transformers import FlaxT5EncoderModel
        from transformers import T5Config as HFT5Config
    except ImportError:
        pytest.skip("transformers has no Flax T5")

    from hypervla_tpu.models.encoders.t5 import T5Config, T5EncoderModel

    hf_config = HFT5Config(
        vocab_size=100, d_model=16, d_kv=8, d_ff=32, num_layers=2,
        num_heads=2, dropout_rate=0.0,
    )
    hf = FlaxT5EncoderModel(hf_config, seed=0)

    ours = T5EncoderModel(
        config=T5Config(
            vocab_size=100, d_model=16, d_kv=8, d_ff=32, num_layers=2,
            num_heads=2, dropout_rate=0.0,
        )
    )
    ids = np.array([[3, 5, 7, 9, 1, 0, 0, 0], [2, 4, 6, 1, 0, 0, 0, 0]],
                   np.int32)
    mask = (ids != 0).astype(np.int32)
    hf_out = hf(input_ids=ids, attention_mask=mask, params=hf.params)
    from hypervla_tpu.models.encoders.pretrained import convert_hf_t5_params

    out = ours.apply({"params": convert_hf_t5_params(hf.params)}, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(hf_out.last_hidden_state),
        atol=2e-5,
    )


def test_clip_vision_matches_hf_flax():
    try:
        from transformers import CLIPVisionConfig as HFCLIPVisionConfig
        from transformers import FlaxCLIPVisionModel
    except ImportError:
        pytest.skip("transformers has no Flax CLIP")

    from hypervla_tpu.models.encoders.clip import (
        CLIPVisionConfig,
        CLIPVisionModel,
    )

    hf_config = HFCLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, patch_size=14, image_size=56,
    )
    hf = FlaxCLIPVisionModel(hf_config, seed=0)
    ours = CLIPVisionModel(
        config=CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, patch_size=14, image_size=56,
        )
    )
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3)), np.float32
    )
    hf_out = hf(np.transpose(x, (0, 3, 1, 2)), params=hf.params)
    out = ours.apply({"params": hf.params}, x)
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        np.asarray(hf_out.last_hidden_state),
        atol=2e-5,
    )
