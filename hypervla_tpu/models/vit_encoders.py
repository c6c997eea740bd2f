"""Patch encoders for ViTs (parity: octo/model/components/vit_encoders.py).

PatchEncoder patchifies directly; SmallStem runs a light conv stack first
(Xiao et al., "Early Convolutions Help Transformers See Better"); ViTResnet is
the ResNet-v2 hybrid stem. All convs here map straight onto the TPU MXU: NHWC
layout, static shapes, channel counts that XLA tiles to 128 lanes.
"""
import functools as ft
from typing import Callable, Sequence, TypeVar

import flax.linen as nn
import jax.numpy as jnp

from hypervla_tpu.models.film import FilmConditioning

T = TypeVar("T")


def normalize_images(img, img_norm_type="default"):
    """Pixel normalization: "default" maps uint8 to [-1, 1]; "imagenet" applies
    ImageNet mean/std (tiled over stacked early-fusion frames)."""
    if img_norm_type == "default":
        return img.astype(jnp.float32) / 127.5 - 1.0
    elif img_norm_type == "imagenet":
        img = img.astype(jnp.float32) / 255
        assert img.shape[-1] % 3 == 0, "images should have rgb channels!"
        mean = jnp.array([0.485, 0.456, 0.406]).reshape((1, 1, 1, 3))
        std = jnp.array([0.229, 0.224, 0.225]).reshape((1, 1, 1, 3))
        num_tile = (1, 1, 1, int(img.shape[-1] / 3))
        return (img - jnp.tile(mean, num_tile)) / jnp.tile(std, num_tile)
    raise ValueError(f"unknown img_norm_type {img_norm_type}")


def weight_standardize(w, axis, eps):
    w = w - jnp.mean(w, axis=axis)
    return w / (jnp.std(w, axis=axis) + eps)


class StdConv(nn.Conv):
    """Convolution with weight standardization applied at parameter read."""

    def param(self, name: str, init_fn: Callable[..., T], *init_args) -> T:
        param = super().param(name, init_fn, *init_args)
        if name == "kernel":
            param = weight_standardize(param, axis=[0, 1, 2], eps=1e-5)
        return param


class PatchEncoder(nn.Module):
    """Single strided conv that splits the image into patch embeddings."""

    use_film: bool = False
    patch_size: int = 32
    num_features: int = 512
    img_norm_type: str = "default"

    @nn.compact
    def __call__(self, observations: jnp.ndarray, train: bool = True, cond_var=None):
        assert self.use_film == (cond_var is not None), (
            "pass cond_var iff use_film"
        )
        x = normalize_images(observations, self.img_norm_type)
        x = nn.Conv(
            features=self.num_features,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="embedding",
        )(x)
        if self.use_film:
            x = FilmConditioning()(x, cond_var)
        return x


class SmallStem(nn.Module):
    """Small conv stem then patchify. `learnable_norm=False` strips GroupNorm
    scale/bias so the hypernet doesn't have to generate them."""

    use_film: bool = False
    patch_size: int = 32
    kernel_sizes: tuple = (3, 3, 3, 3)
    strides: tuple = (2, 2, 2, 2)
    features: tuple = (32, 96, 192, 384)
    padding: tuple = (1, 1, 1, 1)
    num_features: int = 512
    img_norm_type: str = "default"
    learnable_norm: bool = True

    @nn.compact
    def __call__(self, observations: jnp.ndarray, train: bool = True, cond_var=None):
        assert self.use_film == (cond_var is not None), (
            "pass cond_var iff use_film"
        )
        x = normalize_images(observations, self.img_norm_type)
        for kernel_size, stride, features, padding in zip(
            self.kernel_sizes, self.strides, self.features, self.padding
        ):
            x = StdConv(
                features=features,
                kernel_size=(kernel_size, kernel_size),
                strides=(stride, stride),
                padding=padding,
            )(x)
            x = nn.GroupNorm(
                use_scale=self.learnable_norm, use_bias=self.learnable_norm
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            features=self.num_features,
            kernel_size=(self.patch_size // 16, self.patch_size // 16),
            strides=(self.patch_size // 16, self.patch_size // 16),
            padding="VALID",
            name="embedding",
        )(x)
        if self.use_film:
            x = FilmConditioning()(x, cond_var)
        return x


class ResidualUnit(nn.Module):
    """Bottleneck ResNet-v2 block."""

    features: int
    strides: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        needs_projection = x.shape[-1] != self.features * 4 or self.strides != (1, 1)
        residual = x
        if needs_projection:
            residual = StdConv(
                features=self.features * 4,
                kernel_size=(1, 1),
                strides=self.strides,
                use_bias=False,
                name="conv_proj",
            )(residual)
            residual = nn.GroupNorm(name="gn_proj")(residual)
        y = StdConv(
            features=self.features, kernel_size=(1, 1), use_bias=False, name="conv1"
        )(x)
        y = nn.GroupNorm(name="gn1")(y)
        y = nn.relu(y)
        y = StdConv(
            features=self.features,
            kernel_size=(3, 3),
            strides=self.strides,
            use_bias=False,
            name="conv2",
        )(y)
        y = nn.GroupNorm(name="gn2")(y)
        y = nn.relu(y)
        y = StdConv(
            features=self.features * 4, kernel_size=(1, 1), use_bias=False,
            name="conv3",
        )(y)
        y = nn.GroupNorm(name="gn3", scale_init=nn.initializers.zeros)(y)
        return nn.relu(residual + y)


class ResNetStage(nn.Module):
    block_size: int
    nout: int
    first_stride: Sequence[int]

    @nn.compact
    def __call__(self, x):
        x = ResidualUnit(self.nout, strides=self.first_stride, name="unit1")(x)
        for i in range(1, self.block_size):
            x = ResidualUnit(self.nout, strides=(1, 1), name=f"unit{i + 1}")(x)
        return x


class ViTResnet(nn.Module):
    """ResNet-v2 hybrid stem from the original ViT paper."""

    use_film: bool = False
    width: int = 1
    num_layers: tuple = tuple()
    img_norm_type: str = "default"

    @nn.compact
    def __call__(self, observations: jnp.ndarray, train: bool = True, cond_var=None):
        assert self.use_film == (cond_var is not None), (
            "pass cond_var iff use_film"
        )
        x = normalize_images(observations, self.img_norm_type)
        width = int(64 * self.width)
        x = StdConv(
            features=width,
            kernel_size=(7, 7),
            strides=(2, 2),
            use_bias=False,
            name="conv_root",
        )(x)
        x = nn.GroupNorm(name="gn_root")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="SAME")
        if self.num_layers:
            x = ResNetStage(
                block_size=self.num_layers[0],
                nout=width,
                first_stride=(1, 1),
                name="block1",
            )(x)
            for i, block_size in enumerate(self.num_layers[1:], 1):
                x = ResNetStage(
                    block_size=block_size,
                    nout=width * 2**i,
                    first_stride=(2, 2),
                    name=f"block{i + 1}",
                )(x)
                if self.use_film:
                    x = FilmConditioning()(x, cond_var)
        elif self.use_film:
            x = FilmConditioning()(x, cond_var)
        return x


class SmallStem16(SmallStem):
    patch_size: int = 16


class SmallStem32(SmallStem):
    patch_size: int = 32


class ResNet26FILM(ViTResnet):
    use_film: bool = True
    num_layers: tuple = (2, 2, 2, 2)


vit_encoder_configs = {
    "patchify-32-film": ft.partial(PatchEncoder, use_film=True, patch_size=32),
    "patchify-16-film": ft.partial(PatchEncoder, use_film=True, patch_size=16),
    "small-stem-8-film": ft.partial(
        SmallStem,
        use_film=True,
        patch_size=16,
        kernel_sizes=(3, 3, 3),
        strides=(2, 2, 2),
        features=(32, 96, 192),
        padding=(1, 1, 1),
    ),
    "small-stem-16": ft.partial(SmallStem, patch_size=16),
    "small-stem-16-film": ft.partial(SmallStem, use_film=True, patch_size=16),
    "small-stem-32-film": ft.partial(SmallStem, use_film=True, patch_size=32),
    "resnetv2-26-film": ft.partial(ViTResnet, use_film=True, num_layers=(2, 2, 2, 2)),
    "resnetv2-50-film": ft.partial(ViTResnet, use_film=True, num_layers=(3, 4, 6, 3)),
}
