"""1-D conditional U-Net score network for DDPM action heads.

Capability parity with the reference's ConditionalUnet1D
(octo/model/components/unet.py:105): a symmetric down/mid/up stack of
FiLM-conditioned residual conv blocks over the action-horizon axis,
conditioned on (observation embedding, diffusion-time embedding).

Design differences from the reference (TPU-first):
- modules are declared once in setup() as explicit stage lists derived from
  a single `_stage_plan` table — the network topology is data, not control
  flow threaded through a compact call;
- each residual block owns its whole conv-norm-FiLM-conv-norm pipeline and
  decides the residual projection from the input channel count instead of a
  caller-supplied flag;
- the FiLM projection emits (scale, shift) as one matmul output reshaped to
  (..., 2, features) — one MXU op, no split+two-broadcast chain.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

default_init = nn.initializers.xavier_uniform


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def unet_squaredcos_cap_v2(timesteps: int, s: float = 0.008) -> jax.Array:
    """Cosine noise schedule (Nichol & Dhariwal), betas clipped to 0.999."""
    grid = jnp.arange(timesteps + 1, dtype=jnp.float32) / timesteps
    alpha_bar = jnp.cos((grid + s) / (1 + s) * (jnp.pi / 2)) ** 2
    alpha_bar = alpha_bar / alpha_bar[0]
    return jnp.clip(1 - alpha_bar[1:] / alpha_bar[:-1], 0, 0.999)


def fourier_time_embedding(t: jax.Array, features: int) -> jax.Array:
    """sin/cos embedding of scalar diffusion timesteps, half each."""
    freqs = jnp.exp(
        -jnp.log(10000) * jnp.arange(features // 2) / (features // 2 - 1)
    )
    phases = t * freqs
    return jnp.concatenate([jnp.sin(phases), jnp.cos(phases)], axis=-1)


class ConvNormAct1D(nn.Module):
    """conv -> GroupNorm -> mish, the primitive every stage is built from."""

    features: int
    kernel_size: int
    n_groups: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.features,
            (self.kernel_size,),
            padding=self.kernel_size // 2,
        )(x)
        return mish(nn.GroupNorm(self.n_groups)(h))


class FiLMResBlock1D(nn.Module):
    """Residual block with FiLM conditioning between its two conv stages.

    The residual path is projected with a 1x1 conv whenever the input
    channel count differs from `features` (the reference threads an
    explicit residual_proj flag through every call site instead).
    """

    features: int
    kernel_size: int = 3
    n_groups: int = 8

    @nn.compact
    def __call__(self, x, cond):
        h = ConvNormAct1D(self.features, self.kernel_size, self.n_groups)(x)
        # one matmul -> (..., 2, features): [0]=scale, [1]=shift
        film = nn.Dense(2 * self.features, kernel_init=default_init())(
            mish(cond)
        ).reshape(*cond.shape[:-1], 2, self.features)
        h = h * film[..., None, 0, :] + film[..., None, 1, :]
        h = ConvNormAct1D(self.features, self.kernel_size, self.n_groups)(h)
        skip = x
        if x.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1,), padding=0)(x)
        return h + skip


class ConditionalUnet1D(nn.Module):
    """Down/mid/up FiLM-ResNet over the action-chunk axis.

    Stage layout (matching the reference topology): every resolution level
    runs two residual blocks; levels after the first contribute a skip
    tensor to the mirrored decoder level; every level but the deepest
    halves the horizon with a stride-2 conv, mirrored by a stride-2
    transposed conv on the way back up.
    """

    down_features: Tuple[int, ...] = (256, 512, 1024)
    mid_layers: int = 2
    kernel_size: int = 3
    n_groups: int = 8
    time_features: int = 256

    def setup(self):
        blk = lambda f: FiLMResBlock1D(  # noqa: E731
            f, kernel_size=self.kernel_size, n_groups=self.n_groups
        )
        feats = self.down_features
        self.time_mlp = [
            nn.Dense(4 * self.time_features, kernel_init=default_init()),
            nn.Dense(self.time_features, kernel_init=default_init()),
        ]
        self.encoder = [(blk(f), blk(f)) for f in feats]
        self.downsamplers = [
            nn.Conv(f, (3,), strides=(2,)) for f in feats[:-1]
        ]
        self.bottleneck = [blk(feats[-1]) for _ in range(self.mid_layers)]
        self.decoder = [(blk(f), blk(f)) for f in feats[:-1]]
        self.upsamplers = [
            nn.ConvTranspose(f, (4,), strides=(2,)) for f in feats[:-1]
        ]
        self.out_proj = ConvNormAct1D(
            feats[0], self.kernel_size, self.n_groups
        )

    def _condition(self, obs, time):
        t = fourier_time_embedding(time, self.time_features)
        t = self.time_mlp[1](mish(self.time_mlp[0](t)))
        return jnp.concatenate((obs, t), axis=-1)

    def __call__(self, obs, action, time, train: bool = False):
        cond = self._condition(obs, time)
        n_levels = len(self.encoder)

        skips, h = [], action
        for level, (block_a, block_b) in enumerate(self.encoder):
            h = block_b(block_a(h, cond), cond)
            if level > 0:
                skips.append(h)
            if level < n_levels - 1:
                h = self.downsamplers[level](h)

        for block in self.bottleneck:
            h = block(h, cond)

        for level in range(n_levels - 2, -1, -1):
            block_a, block_b = self.decoder[level]
            h = jnp.concatenate((h, skips.pop()), axis=-1)
            h = block_b(block_a(h, cond), cond)
            h = self.upsamplers[level](h)

        return self.out_proj(h)
