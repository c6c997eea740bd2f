"""Action prediction heads.

Capability parity with hypervla/components/action_heads.py (continuous /
discrete / mix / MLP-ResNet DDPM / U-Net DDPM heads and the shared masked
loss helpers). Every head does chunked action prediction: at each window
timestep it predicts the next `action_horizon` actions.

Loss-semantics invariants carried over from the reference (pinned by
tests/test_action_heads.py goldens):
  * masked_mean averages over the *broadcast* mask; heads multiply the
    per-dim mean loss back by their action_dim so losses sum over dims.
  * MixActionHead decodes the gripper as (logit >= 0).
  * DDPM heads train on eps-prediction with a cosine schedule; sampling
    runs as a lax.scan (static trip count — XLA pipelines it on TPU).

Structural choices of this implementation (vs the reference):
  * one `_pooled_readout` helper owns the MAP/mean/flatten pooling all heads
    share;
  * the DDPM forward/reverse process lives in one `DDPMSchedule` value used
    by both diffusion heads instead of per-head alpha bookkeeping;
  * no einops — shapes are reshaped with static sizes.
"""
import logging
from dataclasses import dataclass
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.typing import ArrayLike

from hypervla_tpu.models.diffusion import create_diffusion_model
from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.models.tokenizers import BinTokenizer
from hypervla_tpu.models.transformer import MAPHead
from hypervla_tpu.models.unet import ConditionalUnet1D, unet_squaredcos_cap_v2
from hypervla_tpu.typing import PRNGKey

EPS = 1e-6


# --------------------------------------------------------------------------
# masked loss primitives
# --------------------------------------------------------------------------

def masked_mean(x, mask):
    """Mean of x over elements where (broadcast) mask is set."""
    mask = jnp.broadcast_to(mask, x.shape)
    denom = jnp.clip(jnp.mean(mask), min=1e-5)
    return jnp.mean(x * mask) / denom


_PENALTIES = {
    "mse": lambda d: jnp.square(d),
    "l1": lambda d: jnp.abs(d),
}


def continuous_loss(pred_value, ground_truth_value, mask, loss_type="mse"):
    if loss_type not in _PENALTIES:
        raise ValueError(f"Invalid loss type: {loss_type}")
    err = pred_value - ground_truth_value
    loss = masked_mean(_PENALTIES[loss_type](err), mask)
    mse = loss if loss_type == "mse" else masked_mean(jnp.square(err), mask)
    return loss, {"loss": loss, "mse": mse}


def discrete_loss(discrete_tokenizer: BinTokenizer, logits,
                  ground_truth_value, mask):
    """Cross-entropy against tokenized targets + accuracy/decoded-MSE."""
    labels = discrete_tokenizer(ground_truth_value)
    nll = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), labels[..., None], axis=-1
    )[..., 0]
    loss = masked_mean(nll, mask)
    pred_label = jnp.argmax(logits, axis=-1)
    accuracy = masked_mean(pred_label == labels, mask)
    decoded = discrete_tokenizer.decode(pred_label)
    mse = masked_mean(jnp.square(decoded - ground_truth_value), mask)
    return loss, {"loss": loss, "mse": mse, "accuracy": accuracy}


def binary_loss(logits, ground_truth_value, mask):
    bce = optax.losses.sigmoid_binary_cross_entropy(
        logits, ground_truth_value
    )
    loss = masked_mean(bce, mask)
    return loss, {"loss": loss}


def _chunk_mask(timestep_pad_mask, action_pad_mask):
    """(b, w) & (b, w, h, a) -> the per-element loss mask."""
    return timestep_pad_mask[:, :, None, None] & action_pad_mask


def _pooled_readout(token_group: TokenGroup, map_head=None,
                    train: bool = False, flatten: bool = False) -> Array:
    """(b, w, tokens, emb) -> (b, w, emb'): MAP attention pooling when a
    head is supplied, token-flattening when asked, mean-pool otherwise."""
    assert token_group.tokens.ndim == 4, (
        f"expected (batch, window, tokens, emb), got "
        f"{token_group.tokens.shape}"
    )
    if map_head is not None:
        return map_head(token_group, train=train)[:, :, 0]
    if flatten:
        b, w = token_group.tokens.shape[:2]
        return token_group.tokens.reshape(b, w, -1)
    return token_group.tokens.mean(axis=-2)


def _squash(x, scaling_factor: float, max_action: float) -> Array:
    """Bounded continuous output: max_action * tanh(x / scaling_factor)."""
    return jnp.tanh(x / scaling_factor) * max_action


def _embodiment_mask(lead_shape, action_horizon, action_dim,
                     embodiment_action_dim) -> Array:
    """Boolean (.., horizon, dim) mask of VALID action dims; dims past the
    embodiment's action space stay pure noise during DDPM sampling. Warns
    when no embodiment dim is given (matching the reference behavior)."""
    mask = jnp.ones((*lead_shape, action_horizon, action_dim), dtype=bool)
    if embodiment_action_dim is None:
        logging.warning(
            "embodiment_action_dim is recommended for the diffusion head "
            "if any action dimensions were masked during training"
        )
        return mask
    return mask.at[..., embodiment_action_dim:].set(False)


# --------------------------------------------------------------------------
# DDPM machinery shared by the diffusion heads
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class DDPMSchedule:
    """Precomputed cosine-schedule tensors + the forward/reverse algebra."""

    betas: Array
    alphas: Array
    alpha_bars: Array

    @classmethod
    def cosine(cls, timesteps: int) -> "DDPMSchedule":
        betas = jnp.asarray(
            unet_squaredcos_cap_v2(timesteps), dtype=jnp.float32
        )
        alphas = 1.0 - betas
        return cls(betas=betas, alphas=alphas,
                   alpha_bars=jnp.cumprod(alphas))

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]

    def q_sample(self, x0, t, eps):
        """Forward process: noise x0 to step t."""
        return (
            jnp.sqrt(self.alpha_bars[t]) * x0
            + jnp.sqrt(1 - self.alpha_bars[t]) * eps
        )

    def ddpm_prev_mean(self, x_t, eps_pred, t):
        """Posterior mean via the eps parameterization."""
        return (
            x_t - (1 - self.alphas[t]) / jnp.sqrt(1 - self.alpha_bars[t])
            * eps_pred
        ) / jnp.sqrt(self.alphas[t])


# --------------------------------------------------------------------------
# heads
# --------------------------------------------------------------------------

class ActionHead:
    """Protocol marker for modules that map transformer outputs to actions.

    Every head exposes
      loss(transformer_outputs, actions, timestep_pad_mask, action_pad_mask,
           train) -> (scalar, metrics dict)
      predict_action(transformer_outputs, ...) ->
           (*sample_shape, batch, action_horizon, action_dim)
    where predict_action decodes the LAST window timestep.
    """


class ChunkedHead(nn.Module, ActionHead):
    """Shared configuration surface of the regression-style heads: where to
    read tokens from, the chunk geometry, and the tanh squashing / target
    clipping knobs."""

    readout_key: str
    action_dim: int = 7
    action_horizon: int = 1
    use_map: bool = False
    token_per_horizon: bool = False
    loss_type: str = "mse"
    max_action: float = 5.0
    tanh_scaling_factor: float = 5.0
    squash_continuous_action: bool = True
    clip_target: bool = False

    def _maybe_squash(self, x):
        if not self.squash_continuous_action:
            return x
        return _squash(x, self.tanh_scaling_factor, self.max_action)

    def _maybe_clip_target(self, actions):
        if not self.clip_target:
            return actions
        return jnp.clip(actions, -self.max_action, self.max_action)

    def _decode_last_step(self, per_window_action, sample_shape):
        last = per_window_action[:, -1]
        return jnp.broadcast_to(last, sample_shape + last.shape)


class ContinuousActionHead(ChunkedHead):
    """Tanh-squashed continuous regression head."""

    def setup(self):
        if self.use_map:
            self.map_head = MAPHead()
        self.mean_proj = nn.Dense(self.action_horizon * self.action_dim)

    def __call__(self, transformer_outputs, train: bool = True) -> Array:
        emb = _pooled_readout(
            transformer_outputs[self.readout_key],
            self.map_head if self.use_map else None, train,
        )
        mean = self.mean_proj(emb)
        mean = mean.reshape(
            *mean.shape[:2], self.action_horizon, self.action_dim
        )
        return self._maybe_squash(mean)

    def loss(self, transformer_outputs, actions, timestep_pad_mask,
             action_pad_mask, train: bool = True):
        mean = self(transformer_outputs, train=train)
        loss, metrics = continuous_loss(
            mean,
            self._maybe_clip_target(actions),
            _chunk_mask(timestep_pad_mask, action_pad_mask),
            loss_type=self.loss_type,
        )
        # per-dim means -> sums over the action dimension
        return loss * self.action_dim, {
            k: v * self.action_dim for k, v in metrics.items()
        }

    def predict_action(self, transformer_outputs, train: bool = True,
                       *args, sample_shape: tuple = (), **kwargs) -> Array:
        return self._decode_last_step(
            self(transformer_outputs, train=train), sample_shape
        )


class DiscreteActionHead(nn.Module, ActionHead):
    """Discretized action head over a BinTokenizer vocabulary.

    token_per selects the token/action mapping: "" = one token for
    everything, "action_horizon" = one token per horizon step,
    "action_dim_and_action_horizon" = one token per (dim, step).
    """

    readout_key: str
    action_dim: int = 7
    action_horizon: int = 1
    vocab_size: int = 256
    use_map: bool = False
    normalization_type: str = "uniform"
    token_per: str = "action_dim_and_action_horizon"

    # token layout table: token_per -> tokens used per window step
    def _layout(self) -> int:
        layouts = {
            "": 1,
            "action_horizon": self.action_horizon,
            "action_dim_and_action_horizon":
                self.action_horizon * self.action_dim,
        }
        if self.token_per not in layouts:
            raise ValueError(f"Invalid token_per: {self.token_per}")
        return layouts[self.token_per]

    def setup(self):
        n_tokens = self._layout()
        self.n_tokens = n_tokens
        self.final_layer_size = (
            self.action_horizon * self.action_dim * self.vocab_size
        ) // n_tokens
        if self.use_map:
            self.map_head = MAPHead(num_readouts=n_tokens)
        self.vocab_proj = nn.Dense(self.final_layer_size)
        self.action_tokenizer = BinTokenizer(
            n_bins=self.vocab_size, bin_type=self.normalization_type
        )

    def __call__(self, transformer_outputs, train: bool = True) -> Array:
        group = transformer_outputs[self.readout_key]
        assert group.tokens.ndim == 4, (
            f"expected (batch, window, tokens, emb), got "
            f"{group.tokens.shape}"
        )
        if self.use_map:
            per_token = self.map_head(group, train=train)
        else:
            per_token = group.tokens
            assert per_token.shape[-2] == self.n_tokens, (
                f"discrete head expects {self.n_tokens} tokens"
            )
        return self.vocab_proj(per_token).reshape(
            *per_token.shape[:2], self.action_horizon, self.action_dim,
            self.vocab_size,
        )

    def loss(self, transformer_outputs, actions, timestep_pad_mask,
             action_pad_mask, train: bool = True):
        logits = self(transformer_outputs, train=train)
        loss, metrics = discrete_loss(
            self.action_tokenizer, logits, actions,
            _chunk_mask(timestep_pad_mask, action_pad_mask),
        )
        metrics["mse"] = metrics["mse"] * self.action_dim
        return loss, metrics

    def predict_action(self, transformer_outputs, train: bool = True, *,
                       rng: Optional[PRNGKey] = None, argmax: bool = False,
                       temperature: float = 1.0, sample_shape: tuple = (),
                       **unused_kwargs) -> Array:
        logits = self(transformer_outputs, train=train)[:, -1]
        if argmax:
            choice = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            choice = jnp.broadcast_to(choice, sample_shape + choice.shape)
        else:
            choice = jax.random.categorical(
                rng, logits / temperature, axis=-1,
                shape=sample_shape + logits.shape[:-1],
            ).astype(jnp.int32)
        return self.action_tokenizer.decode(choice)


class MixActionHead(ChunkedHead):
    """Continuous arm dims + binary (sigmoid) gripper dim — the flagship
    head. The gripper is decoded as open/closed from the logit sign."""

    hidden_dims: tuple = tuple()

    def setup(self):
        if self.use_map:
            self.map_head = MAPHead()
        arm_dims = self.action_dim - 1
        if self.token_per_horizon:
            # one readout token per horizon step; heads emit one step each
            self.continuous_head = nn.Dense(arm_dims)
            self.discrete_head = nn.Dense(1)
        else:
            # single readout token; heads emit the whole chunk
            self.continuous_head = nn.Dense(self.action_horizon * arm_dims)
            self.discrete_head = nn.Dense(self.action_horizon)

    @nn.compact
    def __call__(self, transformer_outputs, train: bool = True):
        token_group = transformer_outputs[self.readout_key]
        tokens = token_group.tokens
        assert tokens.ndim == 4, (
            f"expected (batch, window, tokens, emb), got {tokens.shape}"
        )
        expected = self.action_horizon if self.token_per_horizon else 1
        assert tokens.shape[2] == expected, (
            f"token number {tokens.shape[2]} != {expected}"
        )
        embedding = tokens if self.token_per_horizon else tokens.squeeze(2)
        for dim in self.hidden_dims:
            embedding = nn.swish(nn.LayerNorm()(nn.Dense(dim)(embedding)))

        arm = self.continuous_head(embedding)
        gripper_logits = self.discrete_head(embedding)
        if not self.token_per_horizon:
            arm = arm.reshape(
                *arm.shape[:2], self.action_horizon, self.action_dim - 1
            )
            gripper_logits = gripper_logits[:, :, :, None]
        return self._maybe_squash(arm), gripper_logits

    def loss(self, transformer_outputs, actions, timestep_pad_mask,
             action_pad_mask, train: bool = True):
        arm_pred, gripper_logits = self(transformer_outputs, train=train)
        actions = self._maybe_clip_target(actions)
        mask = _chunk_mask(timestep_pad_mask, action_pad_mask)
        arm_dims = self.action_dim - 1
        arm_loss, _ = continuous_loss(
            arm_pred, actions[..., :-1], mask[..., :-1],
            loss_type=self.loss_type,
        )
        arm_loss = arm_loss * arm_dims
        gripper_loss, _ = binary_loss(
            gripper_logits, actions[..., -1:], mask[..., -1:]
        )
        return arm_loss + gripper_loss, {
            "continuous_loss": arm_loss,
            "gripper_loss": gripper_loss,
        }

    def predict_action(self, transformer_outputs, train: bool = True,
                       *args, sample_shape: tuple = (), **kwargs) -> Array:
        arm, gripper_logits = self(transformer_outputs, train=train)
        gripper = (gripper_logits >= 0.0).astype(jnp.float32)
        return self._decode_last_step(
            jnp.concatenate([arm, gripper], -1), sample_shape
        )


class MSEActionHead(ContinuousActionHead):
    """MAP-pooled continuous head, squared-error loss (octo's MSE head)."""

    use_map: bool = True
    loss_type: str = "mse"
    max_action: float = 5.0


class L1ActionHead(ContinuousActionHead):
    """MAP-pooled continuous head, absolute-error loss (octo's L1 head)."""

    use_map: bool = True
    loss_type: str = "l1"
    max_action: float = 5.0


class TokenPerDimActionHead(DiscreteActionHead):
    """Discrete head reading one token per (horizon step, action dim)."""

    token_per: str = "action_dim_and_action_horizon"


class DiffusionActionHead(nn.Module):
    """MLP-ResNet DDPM action head (20 denoising steps by default)."""

    readout_key: str
    action_dim: int = 7
    action_horizon: int = 1
    use_map: bool = False
    loss_type: str = "mse"
    max_action: float = 5.0
    # score-network shape
    hidden_dim: int = 256
    num_blocks: int = 3
    time_dim: int = 32
    use_layer_norm: bool = True
    dropout_rate: float = 0.0
    # DDPM process
    diffusion_steps: int = 20
    n_diffusion_samples: int = 1

    def setup(self):
        if self.use_map:
            self.map_head = MAPHead()
        self.diffusion_model = create_diffusion_model(
            self.action_dim * self.action_horizon,
            time_dim=self.time_dim,
            num_blocks=self.num_blocks,
            dropout_rate=self.dropout_rate,
            hidden_dim=self.hidden_dim,
            use_layer_norm=self.use_layer_norm,
        )
        self.schedule = DDPMSchedule.cosine(self.diffusion_steps)

    @property
    def _flat_dim(self) -> int:
        return self.action_dim * self.action_horizon

    def __call__(self, transformer_outputs,
                 time: Optional[ArrayLike] = None,
                 noisy_actions: Optional[ArrayLike] = None,
                 train: bool = True) -> Array:
        emb = _pooled_readout(
            transformer_outputs[self.readout_key],
            self.map_head if self.use_map else None, train,
        )
        if self.is_initializing():
            time = jnp.zeros((*emb.shape[:2], 1), dtype=jnp.float32)
            noisy_actions = jnp.zeros(
                (*emb.shape[:2], self._flat_dim), dtype=jnp.float32
            )
        elif time is None or noisy_actions is None:
            raise ValueError("Must provide time and noisy_actions.")
        return self.diffusion_model(emb, noisy_actions, time, train=train)

    def loss(self, transformer_outputs, actions, timestep_pad_mask,
             action_pad_mask, train: bool = True):
        batch_size, window_size = timestep_pad_mask.shape
        x0 = jnp.clip(
            actions.reshape(batch_size, window_size, self._flat_dim),
            -self.max_action, self.max_action,
        )

        time_key, noise_key = jax.random.split(self.make_rng("dropout"))
        time = jax.random.randint(
            time_key,
            (self.n_diffusion_samples, batch_size, window_size, 1),
            0, self.schedule.num_steps,
        )
        noise = jax.random.normal(
            noise_key, (self.n_diffusion_samples,) + x0.shape
        )
        noisy_actions = self.schedule.q_sample(x0[None], time, noise)

        pred_eps = self(transformer_outputs, train=train, time=time,
                        noisy_actions=noisy_actions)

        mask = _chunk_mask(timestep_pad_mask, action_pad_mask)
        mask = mask.reshape(batch_size, window_size, self._flat_dim)[None]
        loss, metrics = continuous_loss(
            pred_eps, noise, mask, loss_type=self.loss_type
        )
        return loss * self.action_dim, {
            k: v * self.action_dim for k, v in metrics.items()
        }

    def predict_action(self, transformer_outputs, rng: PRNGKey,
                       train: bool = True,
                       embodiment_action_dim: Optional[int] = None,
                       *args, sample_shape: tuple = (), **kwargs) -> Array:
        sched = self.schedule
        batch_size, window_size = (
            transformer_outputs[self.readout_key].tokens.shape[:2]
        )
        module, variables = self.unbind()
        flat_action_mask = _embodiment_mask(
            (*sample_shape, batch_size, window_size),
            self.action_horizon, self.action_dim, embodiment_action_dim,
        ).reshape(*sample_shape, batch_size, window_size, self._flat_dim)

        def denoise_step(carry, t):
            x, step_rng = carry
            t_in = jnp.broadcast_to(t, (*x.shape[:-1], 1))
            eps_pred = module.apply(
                variables, transformer_outputs, t_in, x, train=train
            )
            x = sched.ddpm_prev_mean(x, eps_pred, t)
            step_rng, key = jax.random.split(step_rng)
            z = jax.random.normal(key, shape=x.shape)
            x = x + (t > 0) * (jnp.sqrt(sched.betas[t]) * z)
            x = jnp.clip(x, -self.max_action, self.max_action)
            # masked-out dims stay pure noise at the current level
            x = jnp.where(
                flat_action_mask, x, jnp.sqrt(1 - sched.alpha_bars[t]) * z
            )
            return (x, step_rng), ()

        rng, key = jax.random.split(rng)
        x_T = jax.random.normal(
            key, (*sample_shape, batch_size, window_size, self._flat_dim)
        )
        (flat, _), () = jax.lax.scan(
            denoise_step, (x_T, rng),
            jnp.arange(sched.num_steps - 1, -1, -1),
        )
        actions = flat.reshape(
            *flat.shape[:-1], self.action_horizon, self.action_dim
        )
        return actions[..., -1, :, :]


class UNetDDPMActionHead(nn.Module):
    """DDPM action head with a 1-D conditional U-Net score network."""

    readout_key: str
    action_dim: int
    action_horizon: int
    flatten_tokens: bool = False
    use_map: bool = False
    max_action: float = 1.0
    timesteps: int = 100
    variance_type: str = "fixed_large"
    clip_sample: Optional[float] = None

    def setup(self):
        self.action_proj = nn.Dense(self.action_dim)
        self.schedule = DDPMSchedule.cosine(self.timesteps)
        self.model = ConditionalUnet1D(
            down_features=(256, 512, 1024),
            mid_layers=2,
            time_features=128,
            kernel_size=5,
        )
        if self.use_map:
            self.map_head = MAPHead()

    def __call__(self, transformer_outputs,
                 time: Optional[ArrayLike] = None,
                 noisy_actions: Optional[ArrayLike] = None,
                 train: bool = True) -> Array:
        assert not (self.use_map and self.flatten_tokens), (
            "Cannot use MAP and flattening!"
        )
        emb = _pooled_readout(
            transformer_outputs[self.readout_key],
            self.map_head if self.use_map else None, train,
            flatten=self.flatten_tokens,
        )
        if self.is_initializing():
            time = jnp.zeros((*emb.shape[:2], 1), dtype=jnp.float32)
            noisy_actions = jnp.zeros(
                (*emb.shape[:2], self.action_horizon, self.action_dim),
                dtype=jnp.float32,
            )
        elif time is None or noisy_actions is None:
            raise ValueError("Must provide time and noisy_actions.")
        eps = self.model(emb, action=noisy_actions, time=time, train=train)
        return self.action_proj(eps)

    def loss(self, transformer_outputs, actions, action_pad_mask,
             timestep_pad_mask, train: bool = True):
        batch_size, window_size = timestep_pad_mask.shape[:2]
        x0 = jnp.clip(actions, -self.max_action, self.max_action)

        time_key, noise_key = jax.random.split(self.make_rng("dropout"))
        time = jax.random.randint(
            time_key, (batch_size, window_size, 1), 0, self.timesteps
        )
        noise = jax.random.normal(noise_key, x0.shape)
        noisy_actions = self.schedule.q_sample(x0, time[:, None], noise)

        pred_eps = self(transformer_outputs, train=train, time=time,
                        noisy_actions=noisy_actions)
        mask = (
            jnp.broadcast_to(action_pad_mask[:, None, None, :], x0.shape)
            * timestep_pad_mask
        )
        loss, metrics = continuous_loss(pred_eps, noise, mask,
                                        loss_type="mse")
        return loss * self.action_dim, {
            k: v * self.action_dim for k, v in metrics.items()
        }

    def predict_action(self, transformer_outputs, rng: PRNGKey,
                       train: bool = True,
                       embodiment_action_dim: Optional[int] = None,
                       *args, **kwargs) -> Array:
        sched = self.schedule
        batch_size, window_size = (
            transformer_outputs[self.readout_key].tokens.shape[:2]
        )
        module, variables = self.unbind()
        action_mask = _embodiment_mask(
            (batch_size, window_size),
            self.action_horizon, self.action_dim, embodiment_action_dim,
        )

        def denoise_step(carry, t):
            x_t, step_rng = carry
            t_in = jnp.broadcast_to(t, (x_t.shape[0], 1, 1))
            a_bar = sched.alpha_bars[t_in]
            a_bar_prev = jnp.where(
                t_in > 0,
                sched.alpha_bars[t_in - 1],
                jnp.float32(1.0),
            )
            alpha = sched.alphas[t_in]
            eps = module.apply(
                variables, transformer_outputs, time=t_in,
                noisy_actions=x_t, train=train,
            )
            # x0 estimate, optionally clipped, then DDPM posterior mean
            x0_est = (x_t - jnp.sqrt(1 - a_bar) * eps) / jnp.sqrt(a_bar)
            if self.clip_sample is not None:
                x0_est = jnp.clip(x0_est, -self.clip_sample,
                                  self.clip_sample)
            x0_coeff = jnp.sqrt(a_bar_prev) * (1 - alpha) / (1 - a_bar)
            xt_coeff = jnp.sqrt(alpha) * (1 - a_bar_prev) / (1 - a_bar)
            x_prev = x0_coeff * x0_est + xt_coeff * x_t

            if self.variance_type == "fixed_large":
                var = 1 - alpha
            elif self.variance_type == "fixed_small":
                var = jnp.clip(
                    (1 - a_bar_prev) / (1 - a_bar) * (1 - alpha), min=1e-20
                )
            else:
                raise ValueError("Invalid schedule provided")
            var = jnp.where(t_in > 0, var, jnp.zeros_like(eps))

            step_rng, z_key = jax.random.split(step_rng)
            z = jax.random.normal(z_key, x_t.shape, dtype=jnp.float32)
            x_prev = jnp.where(
                action_mask,
                x_prev + jnp.sqrt(var) * z,
                jnp.sqrt(1 - a_bar) * z,
            )
            return (x_prev, step_rng), ()

        rng, key = jax.random.split(rng)
        x_T = jax.random.normal(
            key, (batch_size, window_size, self.action_horizon,
                  self.action_dim),
        )
        (sample, _), () = jax.lax.scan(
            denoise_step, (x_T, rng),
            jnp.arange(self.timesteps - 1, -1, -1),
        )
        return sample
