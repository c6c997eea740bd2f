"""Native Flax CLIP vision encoder.

TPU-first reimplementation of the CLIP ViT trunk the reference consumes via
HF FlaxCLIPVisionModel (hypervla/components/base_vit.py:78-80,134-148).
Parameter tree matches HF's (vision_model/{embeddings, pre_layrnorm,
encoder/layers/N/..., post_layernorm}) so pretrained weights convert 1:1.
CLIP specifics: class embedding + learned absolute position table, pre-LN
blocks with quick_gelu MLPs.
"""
import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.typing import Dtype


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    image_size: int = 224
    num_channels: int = 3
    layer_norm_eps: float = 1e-5


_NAMED_CONFIGS = {
    "clip-vit-base-patch16": CLIPVisionConfig(patch_size=16),
    "clip-vit-base-patch32": CLIPVisionConfig(patch_size=32),
    "clip-vit-large-patch14": CLIPVisionConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, patch_size=14,
    ),
    "clip-test": CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, patch_size=16,
    ),
}


def clip_vision_config(name: str) -> CLIPVisionConfig:
    key = name.split("/")[-1]
    if key not in _NAMED_CONFIGS:
        raise ValueError(f"unknown CLIP config {name}")
    return _NAMED_CONFIGS[key]


@dataclasses.dataclass
class CLIPVisionOutput:
    last_hidden_state: jax.Array
    attentions: Optional[Tuple[jax.Array, ...]] = None


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _Embeddings(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        c = self.config
        batch = pixel_values.shape[0]
        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        patches = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(batch, -1, c.hidden_size)
        num_positions = patches.shape[1] + 1
        position_table = nn.Embed(
            num_positions, c.hidden_size, name="position_embedding"
        )
        cls = jnp.broadcast_to(
            class_embedding[None, None], (batch, 1, c.hidden_size)
        ).astype(patches.dtype)
        x = jnp.concatenate([cls, patches], axis=1)
        positions = jnp.arange(num_positions)[None]
        return x + position_table(positions)


class _Attention(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, output_attentions=False):
        c = self.config
        head_dim = c.hidden_size // c.num_attention_heads
        shape = x.shape[:2] + (c.num_attention_heads, head_dim)
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype,
                                      name=name)
        q = dense("q_proj")(x).reshape(shape)
        k = dense("k_proj")(x).reshape(shape)
        v = dense("v_proj")(x).reshape(shape)
        q = q / jnp.sqrt(head_dim).astype(self.dtype)
        weights = jnp.einsum("...qhd,...khd->...hqk", q, k)
        weights = jax.nn.softmax(weights, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", weights, v)
        out = out.reshape(out.shape[:2] + (-1,))
        out = dense("out_proj")(out)
        if output_attentions:
            return out, weights
        return (out,)


class _Layer(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, output_attentions=False):
        c = self.config
        residual = x
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        attn_out = _Attention(c, dtype=self.dtype, name="self_attn")(
            y, output_attentions=output_attentions
        )
        x = residual + attn_out[0]
        residual = x
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        x = residual + _MLP(c, dtype=self.dtype, name="mlp")(y)
        return (x,) + attn_out[1:]


class _MLP(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        x = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = quick_gelu(x)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(x)


class CLIPVisionModel(nn.Module):
    """CLIP vision trunk; input NHWC pixel values (already normalized)."""

    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, output_attentions=False):
        c = self.config

        class _VisionModel(nn.Module):
            config: CLIPVisionConfig
            dtype: Dtype

            @nn.compact
            def __call__(self, pixel_values, output_attentions):
                cc = self.config
                x = _Embeddings(cc, dtype=self.dtype, name="embeddings")(
                    pixel_values
                )
                # HF misspells this module name; keep it for weight compat
                x = nn.LayerNorm(
                    epsilon=cc.layer_norm_eps, dtype=self.dtype,
                    name="pre_layrnorm",
                )(x)
                attentions = () if output_attentions else None

                class _Layers(nn.Module):
                    config: CLIPVisionConfig
                    dtype: Dtype

                    @nn.compact
                    def __call__(self, x, output_attentions):
                        atts = () if output_attentions else None
                        for i in range(self.config.num_hidden_layers):
                            outs = _Layer(
                                self.config, dtype=self.dtype, name=str(i)
                            )(x, output_attentions=output_attentions)
                            x = outs[0]
                            if output_attentions:
                                atts += (outs[1],)
                        return x, atts

                class _Encoder(nn.Module):
                    config: CLIPVisionConfig
                    dtype: Dtype

                    @nn.compact
                    def __call__(self, x, output_attentions):
                        return _Layers(
                            self.config, dtype=self.dtype, name="layers"
                        )(x, output_attentions)

                x, attentions = _Encoder(cc, dtype=self.dtype, name="encoder")(
                    x, output_attentions
                )
                # HF parity: `last_hidden_state` is the RAW encoder output;
                # post_layernorm only feeds the pooled CLS embedding (which
                # the reference never consumes). The layer stays in the param
                # tree for checkpoint compatibility. Verified bit-exact
                # against FlaxCLIPVisionModel in test_hf_encoder_parity.py.
                nn.LayerNorm(
                    epsilon=cc.layer_norm_eps, dtype=self.dtype,
                    name="post_layernorm",
                )(x[:, :1])
                return x, attentions

        x, attentions = _VisionModel(c, dtype=self.dtype, name="vision_model")(
            pixel_values, output_attentions
        )
        return CLIPVisionOutput(
            last_hidden_state=x.astype(jnp.float32), attentions=attentions
        )
