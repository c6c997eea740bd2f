"""MLP-ResNet score network for the diffusion action head.

Capability parity with octo/model/components/diffusion.py (ScoreActor /
MLPResNet / FourierFeatures / cosine_beta_schedule), redesigned:

- the cosine noise schedule lives in one place (unet.py) instead of two
  duplicated copies;
- time preprocessing is a single TimeEncoder module (Fourier features +
  2-layer projection) instead of two separately-plumbed submodules;
- the residual trunk stacks its blocks with nn.scan — one set of stacked
  parameters and one compiled block body regardless of depth, which keeps
  the per-sample vmapped training program small.
"""
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.models.unet import unet_squaredcos_cap_v2

default_init = nn.initializers.xavier_uniform


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jax.Array:
    """Cosine DDPM schedule — same curve the U-Net head uses."""
    return unet_squaredcos_cap_v2(timesteps, s=s)


class TimeEncoder(nn.Module):
    """Diffusion-timestep embedding: (learnable) Fourier features followed
    by a widen-then-project MLP. Equivalent to the reference's
    FourierFeatures + MLP((2*time_dim, time_dim)) pair."""

    time_dim: int
    learnable: bool = True
    activation: Callable = nn.swish

    @nn.compact
    def __call__(self, time: jax.Array, train: bool = False) -> jax.Array:
        half = self.time_dim // 2
        if self.learnable:
            freqs = self.param(
                "kernel", nn.initializers.normal(0.2),
                (half, time.shape[-1]), jnp.float32,
            )
            angles = (2 * jnp.pi) * (time @ freqs.T)
        else:
            rates = jnp.exp(
                -jnp.log(10000) / (half - 1) * jnp.arange(half)
            )
            angles = time * rates
        emb = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)
        emb = nn.Dense(2 * self.time_dim, kernel_init=default_init())(emb)
        emb = self.activation(emb)
        return nn.Dense(self.time_dim, kernel_init=default_init())(emb)


class ResidualMLPBlock(nn.Module):
    """Pre-norm residual MLP: [dropout ->] [LN ->] widen 4x -> act ->
    project back, added to the input."""

    features: int
    activation: Callable = nn.swish
    dropout_rate: float = 0.0
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        if self.dropout_rate and self.dropout_rate > 0:
            h = nn.Dropout(rate=self.dropout_rate)(h, deterministic=not train)
        if self.use_layer_norm:
            h = nn.LayerNorm()(h)
        h = nn.Dense(4 * self.features)(h)
        h = nn.Dense(self.features)(self.activation(h))
        return x + h


class _ScanBlock(ResidualMLPBlock):
    """scan-calling convention adapter: (carry, _) -> (carry, ())."""

    @nn.compact
    def __call__(self, carry, train):
        return super().__call__(carry, train=train), ()


class ResidualMLP(nn.Module):
    """Input projection -> num_blocks scanned ResidualMLPBlocks -> output
    head. Parameters of the blocks are stacked on a leading depth axis."""

    num_blocks: int
    out_dim: int
    hidden_dim: int = 256
    dropout_rate: float = 0.0
    use_layer_norm: bool = False
    activation: Callable = nn.swish

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(self.hidden_dim, kernel_init=default_init())(x)

        ScannedBlocks = nn.scan(
            _ScanBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=self.num_blocks,
        )
        h, _ = ScannedBlocks(
            self.hidden_dim,
            activation=self.activation,
            dropout_rate=self.dropout_rate,
            use_layer_norm=self.use_layer_norm,
            name="blocks",
        )(h, train)
        h = self.activation(h)
        return nn.Dense(self.out_dim, kernel_init=default_init())(h)


class ScoreActor(nn.Module):
    """eps = f(obs_embedding, noisy_actions, t): encodes t, broadcasts the
    observation embedding over any leading sample axes, and runs the
    residual trunk on the concatenation."""

    time_encoder: nn.Module
    trunk: nn.Module

    def __call__(self, obs_enc, actions, time, train: bool = False):
        t_emb = self.time_encoder(time, train=train)
        if obs_enc.shape[:-1] != t_emb.shape[:-1]:
            obs_enc = jnp.broadcast_to(
                obs_enc, t_emb.shape[:-1] + obs_enc.shape[-1:]
            )
        return self.trunk(
            jnp.concatenate([t_emb, obs_enc, actions], axis=-1), train=train
        )


def create_diffusion_model(
    out_dim: int,
    time_dim: int,
    num_blocks: int,
    dropout_rate: float,
    hidden_dim: int,
    use_layer_norm: bool,
) -> ScoreActor:
    return ScoreActor(
        time_encoder=TimeEncoder(time_dim),
        trunk=ResidualMLP(
            num_blocks=num_blocks,
            out_dim=out_dim,
            hidden_dim=hidden_dim,
            dropout_rate=dropout_rate,
            use_layer_norm=use_layer_norm,
        ),
    )
