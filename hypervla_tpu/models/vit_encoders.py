"""Patch encoders for ViTs.

Capability parity with octo/model/components/vit_encoders.py: PatchEncoder
patchifies with one strided conv; SmallStem runs a light conv stack first
(Xiao et al., "Early Convolutions Help Transformers See Better"); ViTResnet
is the ResNet-v2 hybrid stem. All convs map straight onto the TPU MXU: NHWC
layout, static shapes.

Checkpoint compatibility note: module names that appear in parameter paths
(StdConv_i, GroupNorm_i, embedding, conv1/gn1, ...) are pinned explicitly so
generated-weight plans and reference-parity goldens keep loading; the
implementations behind those names are this framework's own (e.g. StdConv is
a direct lax.conv_general_dilated module that standardizes its kernel at use
time, not a flax.nn.Conv subclass hooking the param store).
"""
import functools as ft
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from hypervla_tpu.models.film import FilmConditioning

# (mean, std) per RGB channel — plain tuples; jnp arrays are built lazily
# so importing this module never initializes a JAX backend
_IMAGENET_STATS = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))


def normalize_images(img, img_norm_type: str = "default"):
    """"default": uint8 -> [-1, 1]. "imagenet": mean/std per channel, with
    the stats repeated across stacked early-fusion frames (channel count a
    multiple of 3)."""
    if img_norm_type == "default":
        return img.astype(jnp.float32) * (1.0 / 127.5) - 1.0
    if img_norm_type == "imagenet":
        frames = img.shape[-1] // 3
        assert img.shape[-1] == 3 * frames, "images should have rgb channels!"
        mean, std = (
            jnp.tile(jnp.asarray(s), frames) for s in _IMAGENET_STATS
        )
        return (img.astype(jnp.float32) / 255 - mean) / std
    raise ValueError(f"unknown img_norm_type {img_norm_type}")


class StdConv(nn.Module):
    """Weight-standardized NHWC convolution.

    The kernel is re-centred/re-scaled over its (h, w, in) axes every
    forward pass, then fed to one lax conv — the standardization fuses into
    the conv's operand producer under XLA.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, int, Sequence] = "SAME"
    use_bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        kernel = kernel - kernel.mean(axis=(0, 1, 2))
        kernel = kernel / (kernel.std(axis=(0, 1, 2)) + self.eps)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = lax.conv_general_dilated(
            x, kernel,
            window_strides=self.strides,
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return y


def _patchify(x, num_features: int, patch_size: int):
    """One strided VALID conv named `embedding` — the token projection every
    encoder here ends with."""
    return nn.Conv(
        features=num_features,
        kernel_size=(patch_size, patch_size),
        strides=(patch_size, patch_size),
        padding="VALID",
        name="embedding",
    )(x)


class PatchEncoder(nn.Module):
    """Bare patchifier: normalize -> one strided conv (-> optional FiLM)."""

    use_film: bool = False
    patch_size: int = 32
    num_features: int = 512
    img_norm_type: str = "default"

    @nn.compact
    def __call__(self, observations, train: bool = True, cond_var=None):
        assert self.use_film == (cond_var is not None), (
            "pass cond_var iff use_film"
        )
        tokens = _patchify(
            normalize_images(observations, self.img_norm_type),
            self.num_features, self.patch_size,
        )
        if cond_var is not None:
            tokens = FilmConditioning()(tokens, cond_var)
        return tokens


class SmallStem(nn.Module):
    """Conv stack (StdConv+GroupNorm+relu per stage) then patchify.

    `learnable_norm=False` strips the GroupNorm scale/bias so a hypernet
    generating these weights has fewer blocks to emit.
    """

    use_film: bool = False
    patch_size: int = 32
    kernel_sizes: tuple = (3, 3, 3, 3)
    strides: tuple = (2, 2, 2, 2)
    features: tuple = (32, 96, 192, 384)
    padding: tuple = (1, 1, 1, 1)
    num_features: int = 512
    img_norm_type: str = "default"
    learnable_norm: bool = True

    def _stages(self):
        return zip(self.kernel_sizes, self.strides, self.features,
                   self.padding)

    @nn.compact
    def __call__(self, observations, train: bool = True, cond_var=None):
        assert self.use_film == (cond_var is not None), (
            "pass cond_var iff use_film"
        )
        x = normalize_images(observations, self.img_norm_type)
        for i, (k, s, f, p) in enumerate(self._stages()):
            x = StdConv(
                features=f, kernel_size=(k, k), strides=(s, s), padding=p,
                name=f"StdConv_{i}",
            )(x)
            x = nn.GroupNorm(
                use_scale=self.learnable_norm,
                use_bias=self.learnable_norm,
                name=f"GroupNorm_{i}",
            )(x)
            x = nn.relu(x)
        # the stem downsamples 16x; the patchifier covers the rest
        x = _patchify(x, self.num_features, self.patch_size // 16)
        if cond_var is not None:
            x = FilmConditioning()(x, cond_var)
        return x


class ResidualUnit(nn.Module):
    """ResNet-v2 bottleneck: 1x1 -> 3x3(stride) -> 1x1(4f), GroupNorm after
    each conv, zero-init on the last norm's scale, projected shortcut when
    shape changes."""

    features: int
    strides: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        f = self.features
        shortcut = x
        if self.strides != (1, 1) or x.shape[-1] != 4 * f:
            shortcut = StdConv(
                features=4 * f, kernel_size=(1, 1), strides=self.strides,
                use_bias=False, name="conv_proj",
            )(x)
            shortcut = nn.GroupNorm(name="gn_proj")(shortcut)

        trunk_spec = [
            dict(features=f, kernel_size=(1, 1), strides=(1, 1), tag="1"),
            dict(features=f, kernel_size=(3, 3), strides=self.strides,
                 tag="2"),
            dict(features=4 * f, kernel_size=(1, 1), strides=(1, 1),
                 tag="3"),
        ]
        y = x
        for spec in trunk_spec:
            tag = spec.pop("tag")
            last = tag == "3"
            y = StdConv(use_bias=False, name=f"conv{tag}", **spec)(y)
            y = nn.GroupNorm(
                name=f"gn{tag}",
                scale_init=nn.initializers.zeros
                if last else nn.initializers.ones,
            )(y)
            if not last:
                y = nn.relu(y)
        return nn.relu(shortcut + y)


class ResNetStage(nn.Module):
    block_size: int
    nout: int
    first_stride: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i in range(self.block_size):
            x = ResidualUnit(
                self.nout,
                strides=self.first_stride if i == 0 else (1, 1),
                name=f"unit{i + 1}",
            )(x)
        return x


class ViTResnet(nn.Module):
    """ResNet-v2 hybrid stem from the original ViT paper."""

    use_film: bool = False
    width: int = 1
    num_layers: tuple = tuple()
    img_norm_type: str = "default"

    @nn.compact
    def __call__(self, observations, train: bool = True, cond_var=None):
        assert self.use_film == (cond_var is not None), (
            "pass cond_var iff use_film"
        )
        width = int(64 * self.width)
        x = normalize_images(observations, self.img_norm_type)
        x = StdConv(
            features=width, kernel_size=(7, 7), strides=(2, 2),
            use_bias=False, name="conv_root",
        )(x)
        x = nn.relu(nn.GroupNorm(name="gn_root")(x))
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                        padding="SAME")
        for i, block_size in enumerate(self.num_layers):
            x = ResNetStage(
                block_size=block_size,
                nout=width * 2**i,
                first_stride=(1, 1) if i == 0 else (2, 2),
                name=f"block{i + 1}",
            )(x)
            if self.use_film and i > 0:
                x = FilmConditioning()(x, cond_var)
        if self.use_film and not self.num_layers:
            x = FilmConditioning()(x, cond_var)
        return x


class SmallStem16(SmallStem):
    patch_size: int = 16


class SmallStem32(SmallStem):
    patch_size: int = 32


class ResNet26FILM(ViTResnet):
    use_film: bool = True
    num_layers: tuple = (2, 2, 2, 2)


def _build_encoder_registry():
    """Named encoder variants (same keys as the reference registry,
    octo/model/components/vit_encoders.py:282)."""
    registry = {}
    for ps in (16, 32):
        registry[f"patchify-{ps}-film"] = ft.partial(
            PatchEncoder, use_film=True, patch_size=ps
        )
        registry[f"small-stem-{ps}-film"] = ft.partial(
            SmallStem, use_film=True, patch_size=ps
        )
    registry["small-stem-16"] = ft.partial(SmallStem, patch_size=16)
    # 3-stage stem: downsamples 8x before the patchifier
    registry["small-stem-8-film"] = ft.partial(
        SmallStem,
        use_film=True,
        patch_size=16,
        kernel_sizes=(3,) * 3,
        strides=(2,) * 3,
        features=(32, 96, 192),
        padding=(1,) * 3,
    )
    for depth, layers in ((26, (2, 2, 2, 2)), (50, (3, 4, 6, 3))):
        registry[f"resnetv2-{depth}-film"] = ft.partial(
            ViTResnet, use_film=True, num_layers=layers
        )
    return registry


vit_encoder_configs = _build_encoder_registry()
