"""The tiny generated policy ViT.

Capability parity with hypervla/components/base_vit.py:55-227. Flow: encode
the frame to patch embeddings (SmallStem / PatchEncoder / DINOv2 / CLIP /
SigLIP-precomputed / EfficientNet) -> project to hidden_dim -> append zero
action tokens -> learned positional embedding -> tiny transformer under a
hand-built attention mask (language tokens self-attend only; nothing
attends to action tokens) -> return the last `action_token_num` embeddings.

This is the per-step control hot path: at inference its weights arrive from
the hypernetwork as data, so everything here must be shape-static and
jit-friendly. Submodule names that appear in generated-weight-plan block
names (image_encoder, image_embedding_projection, language_token_projection,
pos_embedding, and the auto-named encoder/transformer) are pinned.
"""
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.models.encoders.dinov2 import DINOv2Model, dinov2_config
from hypervla_tpu.models.transformer import Transformer
from hypervla_tpu.models.vit_encoders import (
    PatchEncoder,
    SmallStem,
    normalize_images,
)

# per-encoder pixel statistics (mean, std)
_PIXEL_STATS = {
    "DINOv2": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "CLIP": (
        (0.48145466, 0.4578275, 0.40821073),
        (0.26862954, 0.26130258, 0.27577711),
    ),
}
# kept as module-level names for external users
DINO_IMAGE_MEAN, DINO_IMAGE_STD = _PIXEL_STATS["DINOv2"]
CLIP_IMAGE_MEAN, CLIP_IMAGE_STD = _PIXEL_STATS["CLIP"]

_EXPECTED_RESOLUTION = {
    "EfficientNet": 300,
    "DINOv2": 224,
    "CLIP": 224,
    "Siglip": 224,
}


def _segment_attention_mask(batch, n_lang, n_patch, n_action):
    """Boolean (B, 1, L, L) mask over [lang | patches | action] segments:
    full attention, except language rows only see language columns and no
    row may look at the trailing action tokens."""
    total = n_lang + n_patch + n_action
    mask = jnp.ones((batch, 1, total, total), dtype=bool)
    if n_lang:
        mask = mask.at[:, :, :n_lang, n_lang:].set(False)
    return mask.at[:, :, : total - n_action, total - n_action:].set(False)


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
    # differentiable flash kernel (training; measured slower at the 257-token
    # flagship geometry — see PERF.md)
    flash_attention_trainable: bool = False
    # capture DINOv2 attention maps (needed for the attention-alignment aux
    # loss and eval-time visualization; skip for fastest serving)
    sow_dino_attention: bool = True
    # stacked DINO layer params + lax.scan (serving fast path: ~16 trunk
    # param buffers instead of ~190 -> far less per-step host dispatch).
    # Incompatible with sow_dino_attention.
    scan_dino_layers: bool = False
    # single-pass Pallas LayerNorm in the trunk (inference-only serving path)
    fused_layer_norm: Union[bool, str] = False
    # rematerialize DINO layer activations in backward (fit bigger batches)
    remat_dino: bool = False
    # named jax.checkpoint policy for the DINO layers ("dots" keeps MXU
    # outputs and recomputes the elementwise LN/GELU/softmax in backward —
    # removes the fp32 [B,257,3072] erf intermediates that make the trunk
    # backward HBM-bound). Overrides remat_dino when set.
    dino_remat_policy: Optional[str] = None
    # "pallas_serving": bs=1 inference trunk as one Pallas weight-streaming
    # kernel (ops/dino_layer.py); needs the "trunk_kernel" collection
    dino_layers_impl: Optional[str] = None
    # attention softmax with MXU sum reductions (pairs with "dot" LN)
    dino_dot_softmax: bool = False
    # geometry-tuned fused Pallas MHA for the bf16 training trunk
    # (ops/fused_attention.py; kills the head-transpose + softmax-stat
    # fusions of the einsum path)
    dino_fused_attention: bool = False
    # fuse every trunk residual add into the LayerNorm that consumes it
    # (ops/add_layer_norm.py; kills the VPU cross-lane LN stat fusions —
    # ~28 ms of the bs=64 flagship step)
    dino_fused_add_ln: bool = False

    def setup(self):
        if self.encoder_type == "DINOv2":
            assert not (self.scan_dino_layers and self.sow_dino_attention), (
                "scan_dino_layers cannot capture attention maps"
            )
            self.image_encoder = DINOv2Model(
                config=dinov2_config(self.pretrained_encoder_name),
                dtype=jnp.dtype(self.encoder_dtype),
                use_flash=self.use_flash_attention,
                flash_trainable=self.flash_attention_trainable,
                scan_layers=self.scan_dino_layers,
                fused_ln=self.fused_layer_norm,
                remat=self.remat_dino,
                remat_policy=self.dino_remat_policy,
                layers_impl=self.dino_layers_impl,
                dot_softmax=self.dino_dot_softmax,
                fused_attention=self.dino_fused_attention,
                fused_add_ln=self.dino_fused_add_ln,
            )
        elif self.encoder_type == "CLIP":
            from hypervla_tpu.models.encoders.clip import (
                CLIPVisionModel,
                clip_vision_config,
            )

            self.image_encoder = CLIPVisionModel(
                config=clip_vision_config("clip-vit-base-patch16")
            )

    # ----------------------------- encoders -----------------------------

    def _pretrained_embeddings(self, images, train):
        """DINOv2/CLIP trunk: pixel-normalize, run the frozen/fine-tuned
        encoder, drop the class token unless kept, optional training-time
        embedding noise."""
        mean, std = (jnp.asarray(s) for s in _PIXEL_STATS[self.encoder_type])
        pixels = (images / 255.0 - mean[None, None, None]) / std[
            None, None, None
        ]
        if self.encoder_type == "CLIP":
            return self.image_encoder(pixels).last_hidden_state[:, 1:]

        outputs = self.image_encoder(
            pixels, output_attentions=self.sow_dino_attention
        )
        if self.sow_dino_attention:
            self.sow("intermediates", "DINO_attention_map",
                     outputs.attentions)
        emb = outputs.last_hidden_state
        if not self.include_class_token:
            emb = emb[:, 1:]
        if self.image_embedding_noise > 0:
            noise = jax.random.normal(
                self.make_rng("embedding_noise"), emb.shape
            )
            emb = emb + self.image_embedding_noise * float(train) * noise
        return emb

    def _patchify(self, images, train, image_embeddings):
        """Dispatches on encoder_type; returns (B, n_patches, hidden_dim)."""
        kind = self.encoder_type
        if kind == "SmallStem":
            patches = SmallStem(
                patch_size=self.patch_size,
                num_features=self.hidden_dim,
                features=self.cnn_channels,
            )(images)
        elif kind == "PatchEncoder":
            patches = PatchEncoder(
                patch_size=self.patch_size, num_features=self.hidden_dim
            )(images)
        elif kind == "EfficientNet":
            from hypervla_tpu.models.efficientnet import (
                MODEL_CONFIGS,
                EfficientNet,
            )

            features = EfficientNet(
                config=MODEL_CONFIGS["efficientnet-b3"]
            )(normalize_images(images), train=train)
            patches = nn.Conv(
                features=self.hidden_dim, kernel_size=(1, 1)
            )(features)
        elif kind in ("DINOv2", "CLIP", "Siglip"):
            if kind != "Siglip" and image_embeddings is None:
                # embeddings may arrive precomputed (SigLIP always; the
                # train step hoists the shared DINOv2 trunk out of its
                # per-sample vmap and injects them — train_step.py)
                image_embeddings = self._pretrained_embeddings(images, train)
            if kind != "Siglip" and not (
                self.fine_tune_pretrained_image_encoder
            ):
                image_embeddings = jax.lax.stop_gradient(image_embeddings)
            patches = nn.Dense(
                self.hidden_dim, name="image_embedding_projection"
            )(image_embeddings)
        else:
            raise NotImplementedError(
                f"Unknown encoder type {kind} for ViT"
            )
        return patches.reshape(images.shape[0], -1, self.hidden_dim)

    def _positional_table(self, n_patch_and_lang):
        """Learned positions; when add_positional_embedding is off, only the
        action tokens get (learned) positions and the rest get zeros."""
        if self.add_positional_embedding:
            return self.param(
                "pos_embedding",
                nn.initializers.normal(stddev=0.02),
                (1, n_patch_and_lang + self.action_token_num,
                 self.hidden_dim),
            )
        action_pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, self.action_token_num, self.hidden_dim),
        )
        return jnp.concatenate(
            [jnp.zeros((1, n_patch_and_lang, self.hidden_dim)), action_pos],
            axis=1,
        )

    # ------------------------------ forward ------------------------------

    @nn.compact
    def __call__(
        self,
        images,
        instruction_embeddings,
        train: bool = True,
        image_embeddings: Optional[jax.Array] = None,
    ):
        B, H, W, _ = images.shape
        expected = _EXPECTED_RESOLUTION.get(self.encoder_type)
        assert expected is None or (H == expected and W == expected), (
            f"{self.encoder_type} input must be {expected}x{expected}."
        )

        patches = self._patchify(images, train, image_embeddings)

        n_lang = 0
        if self.use_language_token:
            n_lang = instruction_embeddings.shape[1]
            lang_tokens = nn.Dense(
                self.hidden_dim, name="language_token_projection"
            )(instruction_embeddings)
            patches = jnp.concatenate([lang_tokens, patches], axis=1)

        x = jnp.concatenate(
            [patches,
             jnp.zeros((B, self.action_token_num, self.hidden_dim))],
            axis=1,
        )
        x = x + self._positional_table(patches.shape[1])
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)

        mask = _segment_attention_mask(
            B, n_lang, patches.shape[1] - n_lang, self.action_token_num
        )
        x, attention_map = Transformer(
            embedding_dim=self.hidden_dim,
            num_layers=self.num_layers,
            mlp_dim=self.mlp_dim,
            num_attention_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            attention_dropout_rate=0.0,
            use_differential_transformer=self.use_differential_transformer,
            return_attention_map=self.return_attention_map,
        )(x, mask, train=train)

        return x[:, -self.action_token_num:], attention_map
