"""The tiny generated policy ViT (parity: hypervla/components/base_vit.py:55-227).

Flow: encode image to patch embeddings (SmallStem / PatchEncoder / DINOv2 /
CLIP / SigLIP-precomputed / EfficientNet) -> project to hidden_dim -> append
zero action tokens -> learned positional embedding -> tiny transformer with a
hand-built attention mask (language tokens self-attend only; nothing attends
to action tokens) -> return the last `action_token_num` embeddings.

This is the per-step control hot path: at inference its weights arrive from
the hypernetwork as data, so everything here must be shape-static and
jit-friendly.
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.models.encoders.dinov2 import DINOv2Model, dinov2_config
from hypervla_tpu.models.transformer import Transformer
from hypervla_tpu.models.vit_encoders import PatchEncoder, SmallStem, normalize_images

DINO_IMAGE_MEAN = (0.485, 0.456, 0.406)
DINO_IMAGE_STD = (0.229, 0.224, 0.225)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class ViT(nn.Module):
    encoder_type: str = "SmallStem"
    patch_size: int = 16
    hidden_dim: int = 64
    num_layers: int = 4
    num_heads: int = 4
    mlp_dim: int = 128
    dropout_rate: float = 0.0
    cnn_channels: tuple = (32, 96, 192, 384)
    action_token_num: int = 1
    use_language_token: bool = False
    fine_tune_pretrained_image_encoder: bool = False
    image_embedding_noise: float = 0.0
    use_differential_transformer: bool = False
    return_attention_map: bool = False
    add_positional_embedding: bool = True
    include_class_token: bool = False
    pretrained_encoder_name: str = "dinov2-base"
    # compute dtype for the heavy pretrained encoder (params stay fp32);
    # "bfloat16" roughly doubles MXU throughput on TPU
    encoder_dtype: str = "float32"
    # fused Pallas attention in the pretrained trunk (TPU serving path)
    use_flash_attention: bool = False
    # capture DINOv2 attention maps (needed for the attention-alignment aux
    # loss and eval-time visualization; skip for fastest serving)
    sow_dino_attention: bool = True
    # stacked DINO layer params + lax.scan (serving fast path: ~16 trunk
    # param buffers instead of ~190 -> far less per-step host dispatch).
    # Incompatible with sow_dino_attention.
    scan_dino_layers: bool = False
    # single-pass Pallas LayerNorm in the trunk (inference-only serving path)
    fused_layer_norm: bool = False

    def setup(self):
        if self.encoder_type == "DINOv2":
            assert not (self.scan_dino_layers and self.sow_dino_attention), (
                "scan_dino_layers cannot capture attention maps"
            )
            self.image_encoder = DINOv2Model(
                config=dinov2_config(self.pretrained_encoder_name),
                dtype=jnp.dtype(self.encoder_dtype),
                use_flash=self.use_flash_attention,
                scan_layers=self.scan_dino_layers,
                fused_ln=self.fused_layer_norm,
            )
        elif self.encoder_type == "CLIP":
            from hypervla_tpu.models.encoders.clip import (
                CLIPVisionModel,
                clip_vision_config,
            )

            self.image_encoder = CLIPVisionModel(
                config=clip_vision_config("clip-vit-base-patch16")
            )

    @nn.compact
    def __call__(
        self,
        images,
        instruction_embeddings,
        train: bool = True,
        image_embeddings: Optional[jax.Array] = None,
    ):
        B, H, W, C = images.shape
        if self.encoder_type == "EfficientNet":
            assert H == 300 and W == 300, "EfficientNet input must be 300x300."
        elif self.encoder_type in ("DINOv2", "CLIP", "Siglip"):
            assert H == 224 and W == 224, "Pretrained encoder input must be 224x224."

        if self.encoder_type == "SmallStem":
            patches = SmallStem(
                patch_size=self.patch_size,
                num_features=self.hidden_dim,
                features=self.cnn_channels,
            )(images)
        elif self.encoder_type == "PatchEncoder":
            patches = PatchEncoder(
                patch_size=self.patch_size, num_features=self.hidden_dim
            )(images)
        elif self.encoder_type == "EfficientNet":
            from hypervla_tpu.models.efficientnet import MODEL_CONFIGS, EfficientNet

            x = normalize_images(images)
            image_embeddings = EfficientNet(config=MODEL_CONFIGS["efficientnet-b3"])(
                x, train=train
            )
            patches = nn.Conv(features=self.hidden_dim, kernel_size=(1, 1))(
                image_embeddings
            )
        elif self.encoder_type in ("DINOv2", "CLIP"):
            raw = images / 255.0
            if self.encoder_type == "DINOv2":
                mean, std = jnp.array(DINO_IMAGE_MEAN), jnp.array(DINO_IMAGE_STD)
            else:
                mean, std = jnp.array(CLIP_IMAGE_MEAN), jnp.array(CLIP_IMAGE_STD)
            raw = (raw - mean[None, None, None]) / std[None, None, None]
            if self.encoder_type == "DINOv2":
                outputs = self.image_encoder(
                    raw, output_attentions=self.sow_dino_attention
                )
                if self.sow_dino_attention:
                    self.sow(
                        "intermediates", "DINO_attention_map", outputs.attentions
                    )
                if self.include_class_token:
                    image_embeddings = outputs.last_hidden_state
                else:
                    image_embeddings = outputs.last_hidden_state[:, 1:]
                if self.image_embedding_noise > 0:
                    noise_key = self.make_rng("embedding_noise")
                    noise = jax.random.normal(noise_key, image_embeddings.shape)
                    image_embeddings = (
                        image_embeddings
                        + self.image_embedding_noise * float(train) * noise
                    )
            else:
                image_embeddings = self.image_encoder(raw).last_hidden_state[:, 1:]
            if not self.fine_tune_pretrained_image_encoder:
                image_embeddings = jax.lax.stop_gradient(image_embeddings)
            patches = nn.Dense(self.hidden_dim, name="image_embedding_projection")(
                image_embeddings
            )
        elif self.encoder_type == "Siglip":
            # SigLIP embeddings are computed outside the graph and passed in
            patches = nn.Dense(self.hidden_dim, name="image_embedding_projection")(
                image_embeddings
            )
        else:
            raise NotImplementedError(
                f"Unknown encoder type {self.encoder_type} for ViT"
            )

        patches = patches.reshape(B, -1, self.hidden_dim)

        if self.use_language_token:
            language_token_num = instruction_embeddings.shape[1]
            token_embedding = nn.Dense(
                self.hidden_dim, name="language_token_projection"
            )(instruction_embeddings)
            patches = jnp.concatenate([token_embedding, patches], axis=1)

        action_tokens = jnp.zeros((B, self.action_token_num, self.hidden_dim))
        x = jnp.concatenate([patches, action_tokens], axis=1)

        if self.add_positional_embedding:
            pos_embedding = self.param(
                "pos_embedding",
                nn.initializers.normal(stddev=0.02),
                (1, x.shape[1], self.hidden_dim),
            )
        else:
            pos_embedding = self.param(
                "pos_embedding",
                nn.initializers.normal(stddev=0.02),
                (1, self.action_token_num, self.hidden_dim),
            )
            pos_embedding = jnp.concatenate(
                [jnp.zeros([1, *patches.shape[1:]]), pos_embedding], axis=1
            )
        x = x + pos_embedding
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)

        attention_mask = jnp.ones((B, 1, x.shape[1], x.shape[1]), dtype=bool)
        if self.use_language_token:
            attention_mask = attention_mask.at[
                :, :, :language_token_num, language_token_num:
            ].set(False)
        attention_mask = attention_mask.at[
            :, :, : -self.action_token_num, -self.action_token_num :
        ].set(False)
        x, attention_map = Transformer(
            embedding_dim=self.hidden_dim,
            num_layers=self.num_layers,
            mlp_dim=self.mlp_dim,
            num_attention_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            attention_dropout_rate=0.0,
            use_differential_transformer=self.use_differential_transformer,
            return_attention_map=self.return_attention_map,
        )(x, attention_mask, train=train)

        action_embeddings = x[:, -self.action_token_num :]
        return action_embeddings, attention_map
