"""1-D conditional U-Net for DDPM action heads (parity: octo/model/components/unet.py)."""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

default_init = nn.initializers.xavier_uniform


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def unet_squaredcos_cap_v2(timesteps, s=0.008):
    t = jnp.linspace(0, timesteps, timesteps + 1) / timesteps
    alphas_cumprod = jnp.cos((t + s) / (1 + s) * jnp.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.clip(betas, 0, 0.999)


class SinusoidalPosEmb(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array):
        half = self.features // 2
        emb = jnp.log(10000) / (half - 1)
        emb = jnp.exp(jnp.arange(half) * -emb)
        emb = x * emb
        return jnp.concatenate((jnp.sin(emb), jnp.cos(emb)), axis=-1)


class Downsample1d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array):
        return nn.Conv(self.features, kernel_size=(3,), strides=(2,))(x)


class Upsample1d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array):
        return nn.ConvTranspose(self.features, kernel_size=(4,), strides=(2,))(x)


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm -> Mish."""

    features: int
    kernel_size: int
    n_groups: int

    @nn.compact
    def __call__(self, x: jax.Array):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=1,
            padding=self.kernel_size // 2,
        )(x)
        x = nn.GroupNorm(self.n_groups)(x)
        return mish(x)


class ConditionalResidualBlock1D(nn.Module):
    features: int
    kernel_size: int = 3
    n_groups: int = 8
    residual_proj: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array):
        residual = x
        x = Conv1dBlock(
            self.features, kernel_size=self.kernel_size, n_groups=self.n_groups
        )(x)
        cond = nn.Dense(2 * self.features, kernel_init=default_init())(mish(cond))
        scale, bias = jnp.split(cond, 2, axis=-1)
        x = x * jnp.expand_dims(scale, axis=-2) + jnp.expand_dims(bias, axis=-2)
        x = Conv1dBlock(
            self.features, kernel_size=self.kernel_size, n_groups=self.n_groups
        )(x)
        if self.residual_proj:
            residual = nn.Conv(self.features, kernel_size=(1,), strides=1, padding=0)(
                residual
            )
        return x + residual


class ConditionalUnet1D(nn.Module):
    down_features: Tuple[int] = (256, 512, 1024)
    mid_layers: int = 2
    kernel_size: int = 3
    n_groups: int = 8
    time_features: int = 256

    @nn.compact
    def __call__(self, obs, action, time, train: bool = False):
        time = SinusoidalPosEmb(self.time_features)(time)
        time = nn.Dense(4 * self.time_features, kernel_init=default_init())(time)
        time = mish(time)
        time = nn.Dense(self.time_features, kernel_init=default_init())(time)
        cond = jnp.concatenate((obs, time), axis=-1)

        hidden_reps = []
        for i, features in enumerate(self.down_features):
            action = ConditionalResidualBlock1D(
                features,
                kernel_size=self.kernel_size,
                n_groups=self.n_groups,
                residual_proj=True,
            )(action, cond)
            action = ConditionalResidualBlock1D(
                features, kernel_size=self.kernel_size, n_groups=self.n_groups
            )(action, cond)
            if i != 0:
                hidden_reps.append(action)
            if i != len(self.down_features) - 1:
                action = Downsample1d(features)(action)

        for _ in range(self.mid_layers):
            action = ConditionalResidualBlock1D(
                self.down_features[-1],
                kernel_size=self.kernel_size,
                n_groups=self.n_groups,
            )(action, cond)

        for features, hidden_rep in reversed(
            list(zip(self.down_features[:-1], hidden_reps))
        ):
            action = jnp.concatenate((action, hidden_rep), axis=-1)
            action = ConditionalResidualBlock1D(
                features,
                kernel_size=self.kernel_size,
                n_groups=self.n_groups,
                residual_proj=True,
            )(action, cond)
            action = ConditionalResidualBlock1D(
                features, kernel_size=self.kernel_size, n_groups=self.n_groups
            )(action, cond)
            action = Upsample1d(features)(action)

        return Conv1dBlock(
            self.down_features[0], kernel_size=self.kernel_size,
            n_groups=self.n_groups,
        )(action)
