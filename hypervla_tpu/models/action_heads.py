"""Action prediction heads (parity: hypervla/components/action_heads.py).

Every head does chunked action prediction: at each window timestep it predicts
the next `action_horizon` actions. The flagship head is MixActionHead:
continuous (tanh-squashed) arm dimensions + a binary-sigmoid gripper dimension.

Loss-semantics notes carried over from the reference:
  * masked_mean averages loss over the *broadcast* mask, then each head
    multiplies back by its action_dim so losses sum over action dims.
  * MixActionHead decodes the gripper as (logit >= 0).
  * DiffusionActionHead uses a 20-step DDPM with cosine betas, run as a
    lax.scan (static trip count — XLA unrolls/pipelines it on TPU).
"""
import logging
from abc import ABC, abstractmethod
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from einops import rearrange
from jax import Array
from jax.typing import ArrayLike

from hypervla_tpu.models.diffusion import cosine_beta_schedule, create_diffusion_model
from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.models.tokenizers import BinTokenizer
from hypervla_tpu.models.transformer import MAPHead
from hypervla_tpu.models.unet import ConditionalUnet1D, unet_squaredcos_cap_v2
from hypervla_tpu.typing import PRNGKey

EPS = 1e-6


class ActionHead(ABC):
    """Interface for modules that map transformer outputs to actions."""

    @abstractmethod
    def loss(
        self,
        transformer_outputs: Dict[str, TokenGroup],
        actions: ArrayLike,
        timestep_pad_mask: ArrayLike,
        action_pad_mask: ArrayLike,
        train: bool = True,
    ) -> Tuple[Array, Dict[str, Array]]:
        raise NotImplementedError

    @abstractmethod
    def predict_action(
        self,
        transformer_outputs: Dict[str, TokenGroup],
        argmax: bool = False,
        sample_shape: Tuple[int, ...] = (),
        rng: Optional[PRNGKey] = None,
        temperature: float = 1.0,
        train: bool = False,
        embodiment_action_dim: Optional[int] = None,
    ) -> Array:
        """Predict the action for the last timestep in the window; returns
        (*sample_shape, batch_size, action_horizon, action_dim)."""
        raise NotImplementedError


def masked_mean(x, mask):
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.mean(x * mask) / jnp.clip(jnp.mean(mask), min=1e-5)


def continuous_loss(pred_value, ground_truth_value, mask, loss_type: str = "mse"):
    if loss_type == "mse":
        loss = jnp.square(pred_value - ground_truth_value)
    elif loss_type == "l1":
        loss = jnp.abs(pred_value - ground_truth_value)
    else:
        raise ValueError(f"Invalid loss type: {loss_type}")
    loss = masked_mean(loss, mask)
    mse = masked_mean(jnp.square(pred_value - ground_truth_value), mask)
    return loss, {"loss": loss, "mse": mse}


def discrete_loss(discrete_tokenizer: BinTokenizer, logits, ground_truth_value, mask):
    labels = discrete_tokenizer(ground_truth_value)
    labels_one_hot = jax.nn.one_hot(labels, logits.shape[-1])
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    loss = masked_mean(-jnp.sum(logprobs * labels_one_hot, axis=-1), mask)
    pred_label = jnp.argmax(logits, axis=-1)
    accuracy = masked_mean(pred_label == labels, mask)
    pred_value = discrete_tokenizer.decode(pred_label)
    mse = masked_mean(jnp.square(pred_value - ground_truth_value), mask)
    return loss, {"loss": loss, "mse": mse, "accuracy": accuracy}


def binary_loss(logits, ground_truth_value, mask):
    loss = optax.losses.sigmoid_binary_cross_entropy(logits, ground_truth_value)
    loss = masked_mean(loss, mask)
    return loss, {"loss": loss}


class ContinuousActionHead(nn.Module, ActionHead):
    """Tanh-squashed continuous regression head."""

    readout_key: str
    use_map: bool = False
    action_horizon: int = 1
    action_dim: int = 7
    max_action: float = 5.0
    loss_type: str = "mse"
    token_per_horizon: bool = False
    squash_continuous_action: bool = True
    tanh_scaling_factor: float = 5.0
    clip_target: bool = False

    def setup(self):
        if self.use_map:
            self.map_head = MAPHead()
        self.mean_proj = nn.Dense(self.action_horizon * self.action_dim)

    def __call__(
        self, transformer_outputs: Dict[str, TokenGroup], train: bool = True
    ) -> jax.Array:
        token_group = transformer_outputs[self.readout_key]
        assert token_group.tokens.ndim == 4, (
            f"expected (batch, window, tokens, emb), got {token_group.tokens.shape}"
        )
        if self.use_map:
            embeddings = self.map_head(token_group, train=train)[:, :, 0]
        else:
            embeddings = token_group.tokens.mean(axis=-2)
        mean = self.mean_proj(embeddings)
        mean = rearrange(
            mean, "b w (h a) -> b w h a", h=self.action_horizon, a=self.action_dim
        )
        if self.squash_continuous_action:
            mean = jnp.tanh(mean / self.tanh_scaling_factor) * self.max_action
        return mean

    def loss(
        self,
        transformer_outputs,
        actions,
        timestep_pad_mask,
        action_pad_mask,
        train: bool = True,
    ):
        mean = self(transformer_outputs, train=train)
        mask = timestep_pad_mask[:, :, None, None] & action_pad_mask
        if self.clip_target:
            actions = jnp.clip(actions, -self.max_action, self.max_action)
        loss, metrics = continuous_loss(mean, actions, mask, loss_type=self.loss_type)
        # sum (not mean) over action dims
        loss = loss * self.action_dim
        metrics["loss"] = metrics["loss"] * self.action_dim
        metrics["mse"] = metrics["mse"] * self.action_dim
        return loss, metrics

    def predict_action(
        self, transformer_outputs, train: bool = True, *args,
        sample_shape: tuple = (), **kwargs,
    ) -> jax.Array:
        mean = self(transformer_outputs, train=train)[:, -1]
        return jnp.broadcast_to(mean, sample_shape + mean.shape)


class DiscreteActionHead(nn.Module, ActionHead):
    """Discretized action head over a BinTokenizer vocabulary.

    token_per selects the token/action mapping: "" = one token for everything,
    "action_horizon" = one token per horizon step, "action_dim_and_action_horizon"
    = one token per (dim, step).
    """

    readout_key: str
    use_map: bool = False
    token_per: str = "action_dim_and_action_horizon"
    action_horizon: int = 1
    action_dim: int = 7
    vocab_size: int = 256
    normalization_type: str = "uniform"

    def setup(self):
        total_output = self.action_horizon * self.action_dim * self.vocab_size
        if self.token_per == "":
            self.n_tokens = 1
            self.final_layer_size = total_output
        elif self.token_per == "action_horizon":
            self.n_tokens = self.action_horizon
            self.final_layer_size = total_output // self.action_horizon
        elif self.token_per == "action_dim_and_action_horizon":
            self.n_tokens = self.action_horizon * self.action_dim
            self.final_layer_size = self.vocab_size
        else:
            raise ValueError(f"Invalid token_per: {self.token_per}")
        if self.use_map:
            self.map_head = MAPHead(num_readouts=self.n_tokens)
        self.vocab_proj = nn.Dense(self.final_layer_size)
        self.action_tokenizer = BinTokenizer(
            n_bins=self.vocab_size, bin_type=self.normalization_type
        )

    def __call__(
        self, transformer_outputs: Dict[str, TokenGroup], train: bool = True
    ) -> jax.Array:
        token_group = transformer_outputs[self.readout_key]
        assert token_group.tokens.ndim == 4, (
            f"expected (batch, window, tokens, emb), got {token_group.tokens.shape}"
        )
        if self.use_map:
            embeddings = self.map_head(token_group, train=train)
        else:
            embeddings = token_group.tokens
            assert embeddings.shape[-2] == self.n_tokens, (
                f"discrete head expects {self.n_tokens} tokens"
            )
        batch_size, window_size = embeddings.shape[:2]
        logits = self.vocab_proj(embeddings)
        return logits.reshape(
            batch_size, window_size, self.action_horizon, self.action_dim,
            self.vocab_size,
        )

    def loss(
        self,
        transformer_outputs,
        actions,
        timestep_pad_mask,
        action_pad_mask,
        train: bool = True,
    ):
        action_logits = self(transformer_outputs, train=train)
        mask = timestep_pad_mask[:, :, None, None] & action_pad_mask
        loss, metrics = discrete_loss(
            self.action_tokenizer, action_logits, actions, mask
        )
        metrics["mse"] = metrics["mse"] * self.action_dim
        return loss, metrics

    def predict_action(
        self,
        transformer_outputs,
        train: bool = True,
        argmax: bool = False,
        sample_shape: tuple = (),
        rng: Optional[PRNGKey] = None,
        temperature: float = 1.0,
        **unused_kwargs,
    ) -> jax.Array:
        action_logits = self(transformer_outputs, train=train)[:, -1]
        if argmax:
            action_tokens = jnp.argmax(action_logits, axis=-1).astype(jnp.int32)
            action_tokens = jnp.broadcast_to(
                action_tokens, sample_shape + action_tokens.shape
            )
        else:
            action_tokens = jax.random.categorical(
                rng, action_logits / temperature, axis=-1,
                shape=sample_shape + action_logits.shape[:-1],
            ).astype(jnp.int32)
        return self.action_tokenizer.decode(action_tokens)


class MixActionHead(nn.Module, ActionHead):
    """Continuous arm dims + binary (sigmoid) gripper dim — the flagship head."""

    readout_key: str
    use_map: bool = False
    action_horizon: int = 1
    action_dim: int = 7
    max_action: float = 5.0
    loss_type: str = "mse"
    token_per_horizon: bool = False
    squash_continuous_action: bool = True
    tanh_scaling_factor: float = 5.0
    clip_target: bool = False
    hidden_dims: tuple = tuple()

    def setup(self):
        if self.use_map:
            self.map_head = MAPHead()
        if self.token_per_horizon:
            self.continuous_head = nn.Dense(self.action_dim - 1)
            self.discrete_head = nn.Dense(1)
        else:
            self.continuous_head = nn.Dense(
                self.action_horizon * (self.action_dim - 1)
            )
            self.discrete_head = nn.Dense(self.action_horizon)

    @nn.compact
    def __call__(
        self, transformer_outputs: Dict[str, TokenGroup], train: bool = True
    ):
        token_group = transformer_outputs[self.readout_key]
        assert token_group.tokens.ndim == 4, (
            f"expected (batch, window, tokens, emb), got {token_group.tokens.shape}"
        )
        if self.token_per_horizon:
            assert token_group.tokens.shape[2] == self.action_horizon, (
                f"token number {token_group.tokens.shape[2]} != horizon"
            )
            embedding = token_group.tokens
            for dim in self.hidden_dims:
                embedding = nn.Dense(dim)(embedding)
                embedding = nn.LayerNorm()(embedding)
                embedding = nn.swish(embedding)
            continuous_action = self.continuous_head(embedding)
            discrete_logits = self.discrete_head(embedding)
        else:
            assert token_group.tokens.shape[2] == 1, (
                f"token number {token_group.tokens.shape[2]} != 1"
            )
            embedding = token_group.tokens.squeeze(2)
            for dim in self.hidden_dims:
                embedding = nn.Dense(dim)(embedding)
                embedding = nn.LayerNorm()(embedding)
                embedding = nn.swish(embedding)
            continuous_action = self.continuous_head(embedding)
            continuous_action = rearrange(
                continuous_action,
                "b w (h a) -> b w h a",
                h=self.action_horizon,
                a=self.action_dim - 1,
            )
            discrete_logits = self.discrete_head(embedding)[:, :, :, None]

        if self.squash_continuous_action:
            continuous_action = (
                jnp.tanh(continuous_action / self.tanh_scaling_factor)
                * self.max_action
            )
        return continuous_action, discrete_logits

    def loss(
        self,
        transformer_outputs,
        actions,
        timestep_pad_mask,
        action_pad_mask,
        train: bool = True,
    ):
        continuous_action, discrete_logits = self(transformer_outputs, train=train)
        if self.clip_target:
            actions = jnp.clip(actions, -self.max_action, self.max_action)
        mask = timestep_pad_mask[:, :, None, None] & action_pad_mask
        continuous_loss_term, _ = continuous_loss(
            continuous_action,
            actions[:, :, :, :-1],
            mask[:, :, :, :-1],
            loss_type=self.loss_type,
        )
        discrete_loss_term, _ = binary_loss(
            discrete_logits, actions[:, :, :, -1:], mask[:, :, :, -1:]
        )
        loss = continuous_loss_term * (self.action_dim - 1) + discrete_loss_term
        metrics = {
            "continuous_loss": continuous_loss_term * (self.action_dim - 1),
            "gripper_loss": discrete_loss_term,
        }
        return loss, metrics

    def predict_action(
        self, transformer_outputs, train: bool = True, *args,
        sample_shape: tuple = (), **kwargs,
    ) -> jax.Array:
        continuous_actions, discrete_logits = self(transformer_outputs, train=train)
        gripper_actions = (discrete_logits >= 0.0).astype(jnp.float32)
        action = jnp.concatenate([continuous_actions, gripper_actions], -1)[:, -1]
        return jnp.broadcast_to(action, sample_shape + action.shape)


class MSEActionHead(ContinuousActionHead):
    max_action: float = 5.0
    loss_type: str = "mse"
    use_map: bool = True


class L1ActionHead(ContinuousActionHead):
    max_action: float = 5.0
    loss_type: str = "l1"
    use_map: bool = True


class TokenPerDimActionHead(DiscreteActionHead):
    token_per: str = "action_dim_and_action_horizon"


class DiffusionActionHead(nn.Module):
    """MLP-ResNet DDPM action head (20 denoising steps by default)."""

    readout_key: str
    use_map: bool = False
    action_horizon: int = 1
    action_dim: int = 7
    max_action: float = 5.0
    loss_type: str = "mse"
    time_dim: int = 32
    num_blocks: int = 3
    dropout_rate: float = 0.0
    hidden_dim: int = 256
    use_layer_norm: bool = True
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
        self.betas = jnp.array(cosine_beta_schedule(self.diffusion_steps))
        self.alphas = 1 - self.betas
        self.alpha_hats = jnp.cumprod(self.alphas)

    def __call__(
        self,
        transformer_outputs: Dict[str, TokenGroup],
        time: Optional[ArrayLike] = None,
        noisy_actions: Optional[ArrayLike] = None,
        train: bool = True,
    ) -> jax.Array:
        token_group = transformer_outputs[self.readout_key]
        assert token_group.tokens.ndim == 4, (
            f"expected (batch, window, tokens, emb), got {token_group.tokens.shape}"
        )
        if self.use_map:
            embeddings = self.map_head(token_group, train=train)[:, :, 0]
        else:
            embeddings = token_group.tokens.mean(axis=-2)

        if (time is None or noisy_actions is None) and not self.is_initializing():
            raise ValueError("Must provide time and noisy_actions when calling.")
        elif self.is_initializing():
            time = jnp.zeros((*embeddings.shape[:2], 1), dtype=jnp.float32)
            noisy_actions = jnp.zeros(
                (*embeddings.shape[:2], self.action_dim * self.action_horizon),
                dtype=jnp.float32,
            )
        return self.diffusion_model(embeddings, noisy_actions, time, train=train)

    def loss(
        self,
        transformer_outputs,
        actions,
        timestep_pad_mask,
        action_pad_mask,
        train: bool = True,
    ):
        batch_size, window_size = timestep_pad_mask.shape
        actions_flat = rearrange(actions, "b w h a -> b w (h a)")
        actions_flat = jnp.clip(actions_flat, -self.max_action, self.max_action)

        rng = self.make_rng("dropout")
        time_key, noise_key = jax.random.split(rng)
        time = jax.random.randint(
            time_key,
            (self.n_diffusion_samples, batch_size, window_size, 1),
            0,
            self.diffusion_steps,
        )
        noise = jax.random.normal(
            noise_key, (self.n_diffusion_samples,) + actions_flat.shape
        )
        scale = jnp.sqrt(self.alpha_hats[time])
        std = jnp.sqrt(1 - self.alpha_hats[time])
        noisy_actions = scale * actions_flat[None] + std * noise

        pred_eps = self(
            transformer_outputs, train=train, time=time, noisy_actions=noisy_actions
        )

        mask = timestep_pad_mask[:, :, None, None] & action_pad_mask
        mask = rearrange(mask, "b w h a -> b w (h a)")[None]
        loss, metrics = continuous_loss(pred_eps, noise, mask, loss_type=self.loss_type)
        loss = loss * self.action_dim
        metrics["loss"] = metrics["loss"] * self.action_dim
        metrics["mse"] = metrics["mse"] * self.action_dim
        return loss, metrics

    def predict_action(
        self,
        transformer_outputs,
        rng: PRNGKey,
        train: bool = True,
        embodiment_action_dim: Optional[int] = None,
        *args,
        sample_shape: tuple = (),
        **kwargs,
    ) -> jax.Array:
        if embodiment_action_dim is None:
            logging.warning(
                "embodiment_action_dim is recommended for the diffusion head if "
                "any action dimensions were masked during training"
            )
        batch_size, window_size = transformer_outputs[self.readout_key].tokens.shape[:2]
        module, variables = self.unbind()

        action_mask = jnp.ones(
            (*sample_shape, batch_size, window_size, self.action_horizon,
             self.action_dim),
            dtype=bool,
        )
        if embodiment_action_dim is not None:
            action_mask = action_mask.at[..., embodiment_action_dim:].set(False)
        flat_action_mask = rearrange(action_mask, "... p a -> ... (p a)")

        def scan_fn(carry, time):
            current_x, rng = carry
            input_time = jnp.broadcast_to(time, (*current_x.shape[:-1], 1))
            eps_pred = module.apply(
                variables, transformer_outputs, input_time, current_x, train=train
            )
            alpha_1 = 1 / jnp.sqrt(self.alphas[time])
            alpha_2 = (1 - self.alphas[time]) / jnp.sqrt(1 - self.alpha_hats[time])
            current_x = alpha_1 * (current_x - alpha_2 * eps_pred)

            rng, key = jax.random.split(rng)
            z = jax.random.normal(key, shape=current_x.shape)
            current_x = current_x + (time > 0) * (jnp.sqrt(self.betas[time]) * z)
            current_x = jnp.clip(current_x, -self.max_action, self.max_action)
            current_x = jnp.where(
                flat_action_mask, current_x, jnp.sqrt(1 - self.alpha_hats[time]) * z
            )
            return (current_x, rng), ()

        rng, key = jax.random.split(rng)
        noise = jax.random.normal(
            key,
            (*sample_shape, batch_size, window_size,
             self.action_horizon * self.action_dim),
        )
        (actions_flat, _), () = jax.lax.scan(
            scan_fn, (noise, rng), jnp.arange(self.diffusion_steps - 1, -1, -1)
        )
        actions = rearrange(
            actions_flat, "... (h a) -> ... h a",
            h=self.action_horizon, a=self.action_dim,
        )
        return actions[..., -1, :, :]


class UNetDDPMActionHead(nn.Module):
    """DDPM action head with a 1-D conditional U-Net score network."""

    readout_key: str
    action_dim: int
    action_horizon: int
    use_map: bool = False
    flatten_tokens: bool = False
    timesteps: int = 100
    max_action: float = 1.0
    clip_sample: Optional[float] = None
    variance_type: str = "fixed_large"

    def setup(self):
        self.action_proj = nn.Dense(self.action_dim)
        betas = unet_squaredcos_cap_v2(self.timesteps).astype(jnp.float32)
        self.alphas = 1.0 - betas
        self.alphas_cumprod = jnp.cumprod(self.alphas, axis=0)
        self.model = ConditionalUnet1D(
            down_features=(256, 512, 1024),
            mid_layers=2,
            time_features=128,
            kernel_size=5,
        )
        if self.use_map:
            self.map_head = MAPHead()

    def __call__(
        self,
        transformer_outputs: Dict[str, TokenGroup],
        time: Optional[ArrayLike] = None,
        noisy_actions: Optional[ArrayLike] = None,
        train: bool = True,
    ) -> jax.Array:
        token_group = transformer_outputs[self.readout_key]
        assert token_group.tokens.ndim == 4, (
            f"expected (batch, window, tokens, emb), got {token_group.tokens.shape}"
        )
        if self.use_map:
            assert not self.flatten_tokens, "Cannot use MAP and flattening!"
            embeddings = self.map_head(token_group, train=train)[:, :, 0]
        elif self.flatten_tokens:
            embeddings = token_group.tokens.reshape((*token_group.tokens.shape[:2], -1))
        else:
            embeddings = token_group.tokens.mean(axis=-2)

        if (time is None or noisy_actions is None) and not self.is_initializing():
            raise ValueError("Must provide time and noisy_actions when calling.")
        elif self.is_initializing():
            time = jnp.zeros((*embeddings.shape[:2], 1), dtype=jnp.float32)
            noisy_actions = jnp.zeros(
                (*embeddings.shape[:2], self.action_horizon, self.action_dim),
                dtype=jnp.float32,
            )
        pred_eps = self.model(embeddings, action=noisy_actions, time=time, train=train)
        return self.action_proj(pred_eps)

    def loss(
        self,
        transformer_outputs,
        actions,
        action_pad_mask,
        timestep_pad_mask,
        train: bool = True,
    ):
        batch_size, window_size = timestep_pad_mask.shape[:2]
        actions = jnp.clip(actions, -self.max_action, self.max_action)

        rng = self.make_rng("dropout")
        time_key, noise_key = jax.random.split(rng)
        time = jax.random.randint(
            time_key, (batch_size, window_size, 1), 0, self.timesteps
        )
        noise = jax.random.normal(noise_key, actions.shape)
        sqrt_alpha_prod = jnp.sqrt(self.alphas_cumprod[time[:, None]])
        sqrt_one_minus = jnp.sqrt(1 - self.alphas_cumprod[time[:, None]])
        noisy_actions = sqrt_alpha_prod * actions + sqrt_one_minus * noise

        pred_eps = self(
            transformer_outputs, train=train, time=time, noisy_actions=noisy_actions
        )
        mask = (
            jnp.broadcast_to(action_pad_mask[:, None, None, :], actions.shape)
            * timestep_pad_mask
        )
        loss, metrics = continuous_loss(pred_eps, noise, mask, loss_type="mse")
        loss = loss * self.action_dim
        metrics["loss"] = metrics["loss"] * self.action_dim
        metrics["mse"] = metrics["mse"] * self.action_dim
        return loss, metrics

    def predict_action(
        self,
        transformer_outputs,
        rng: PRNGKey,
        train: bool = True,
        embodiment_action_dim: Optional[int] = None,
        *args,
        **kwargs,
    ) -> jax.Array:
        batch_size, window_size = transformer_outputs[self.readout_key].tokens.shape[:2]
        module, variables = self.unbind()

        action_mask = jnp.ones(
            (batch_size, window_size, self.action_horizon, self.action_dim),
            dtype=bool,
        )
        if embodiment_action_dim is not None:
            action_mask = action_mask.at[..., embodiment_action_dim:].set(False)
        else:
            logging.warning(
                "embodiment_action_dim is recommended for the diffusion head if "
                "any action dimensions were masked during training"
            )

        def loop_body(i, args):
            sample, rng = args
            time = self.timesteps - 1 - i
            time = jnp.broadcast_to(time, (sample.shape[0], 1, 1))
            alpha = self.alphas[time]
            alpha_prod_t = self.alphas_cumprod[time]
            alpha_prod_t_prev = jnp.where(
                time > 0,
                self.alphas_cumprod[time - 1],
                jnp.array(1.0, dtype=jnp.float32),
            )
            eps = module.apply(
                variables, transformer_outputs, time=time, noisy_actions=sample,
                train=train,
            )
            orig = (sample - jnp.sqrt(1 - alpha_prod_t) * eps) / jnp.sqrt(alpha_prod_t)
            if self.clip_sample is not None:
                orig = jnp.clip(orig, -self.clip_sample, self.clip_sample)
            orig_coeff = jnp.sqrt(alpha_prod_t_prev) * (1 - alpha) / (1 - alpha_prod_t)
            current_coeff = (
                jnp.sqrt(alpha) * (1 - alpha_prod_t_prev) / (1 - alpha_prod_t)
            )
            prev = orig_coeff * orig + current_coeff * sample

            variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * (1 - alpha)
            if self.variance_type == "fixed_large":
                variance = 1 - alpha
            elif self.variance_type == "fixed_small":
                variance = jnp.clip(variance, min=1e-20)
            else:
                raise ValueError("Invalid schedule provided")

            rng, key = jax.random.split(rng)
            variance = jnp.where(
                time > 0, variance, jnp.zeros(eps.shape, dtype=jnp.float32)
            )
            z = jax.random.normal(key, shape=sample.shape, dtype=jnp.float32)
            prev = prev + jnp.sqrt(variance) * z
            prev = jnp.where(action_mask, prev, jnp.sqrt(1 - alpha_prod_t) * z)
            return (prev, rng)

        rng, key = jax.random.split(rng)
        noisy_action = jax.random.normal(
            key, (batch_size, window_size, self.action_horizon, self.action_dim)
        )
        noisy_action, _ = jax.lax.fori_loop(
            0, self.timesteps, loop_body, (noisy_action, rng)
        )
        return noisy_action
