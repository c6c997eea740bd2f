"""Observation/task tokenizers.

Capability parity with octo/model/components/tokenizers.py (ImageTokenizer,
LanguageTokenizer, BinTokenizer, LowdimObsTokenizer, TokenLearner). The
LanguageTokenizer wraps OUR native T5 encoder
(hypervla_tpu.models.encoders.t5) rather than a HuggingFace module — same
math, TPU-friendly implementation — but keeps the `hf_model` submodule name
so param trees stay checkpoint-compatible.

Structural choices vs the reference: key gathering is one `_gather_matching`
helper shared by the tokenizers; BinTokenizer encodes with a vectorized
searchsorted instead of materializing an (n_bins+1)-wide one-hot compare.
"""
import logging
import re
from typing import Dict, Optional, Sequence

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.models.transformer import MAPHead
from hypervla_tpu.utils.spec import ModuleSpec

EPS = 1e-6


def regex_match(regex_keys, x) -> bool:
    return any(re.match(pattern, x) for pattern in regex_keys)


def regex_filter(regex_keys, xs):
    return [x for x in xs if regex_match(regex_keys, x)]


def _gather_matching(mapping, keys, min_rank: Optional[int] = None):
    """Concatenates mapping[key] for the given keys along the channel axis,
    optionally checking each entry has at least `min_rank` dims."""
    parts = []
    for key in keys:
        if min_rank is not None:
            assert mapping[key].ndim >= min_rank, (
                f"{key}: expected rank >= {min_rank}, got "
                f"{mapping[key].shape}"
            )
        parts.append(mapping[key])
    return jnp.concatenate(parts, axis=-1)


def generate_proper_pad_mask(
    tokens: jax.Array,
    pad_mask_dict: Optional[Dict[str, jax.Array]],
    keys: Sequence[str],
) -> jax.Array:
    """Per-token validity from the batch's pad_mask_dict: a token row is
    valid if ANY of its source keys is non-padding. Falls back to all-ones
    (with a warning) when masks are unavailable."""
    missing = (
        None if pad_mask_dict is None
        else [k for k in keys if k not in pad_mask_dict]
    )
    if pad_mask_dict is None:
        logging.warning("No pad_mask_dict found. Nothing will be masked.")
        return jnp.ones(tokens.shape[:-1])
    if missing:
        logging.warning(
            f"pad_mask_dict missing keys {set(missing)}. "
            "Nothing will be masked."
        )
        return jnp.ones(tokens.shape[:-1])
    valid = jnp.any(
        jnp.stack([pad_mask_dict[k] for k in keys], axis=-1), axis=-1
    )
    return jnp.broadcast_to(valid[..., None], tokens.shape[:-1])


class TokenLearner(nn.Module):
    """Compresses a token sequence to `num_tokens` learned readouts via MAP
    attention pooling over position-embedded, normalized inputs."""

    num_tokens: int

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            inputs.shape[-2:],
        )
        x = nn.LayerNorm()(inputs + jnp.broadcast_to(pos, inputs.shape))
        return MAPHead(num_readouts=self.num_tokens)(x, train=train)


class ImageTokenizer(nn.Module):
    """Stacks matching image observation/task channels and runs a conv
    encoder over each frame; optionally compresses with a TokenLearner."""

    encoder: ModuleSpec
    obs_stack_keys: Sequence[str] = ("image_.*", "depth_.*")
    task_stack_keys: Sequence[str] = tuple()
    task_film_keys: Sequence[str] = tuple()
    use_token_learner: bool = False
    num_tokens: int = 8
    proper_pad_mask: bool = True
    conditioning_type: str = "none"

    def _stack_task_channels(self, enc_inputs, observations, tasks):
        """Appends goal-image channels (zero-padded when the task lacks
        them), repeated across the window axis."""
        for k in regex_filter(self.task_stack_keys, observations.keys()):
            if k not in tasks:
                logging.info(f"No task inputs matching {k}; zero-padding.")
                tasks = flax.core.copy(
                    tasks, {k: jnp.zeros_like(observations[k][:, 0])}
                )
        matched = regex_filter(self.task_stack_keys, sorted(tasks.keys()))
        if not matched:
            raise ValueError(
                f"No task inputs matching {self.task_stack_keys} were found."
            )
        goal = _gather_matching(tasks, matched, min_rank=4)
        goal = goal[:, None].repeat(enc_inputs.shape[1], axis=1)
        return jnp.concatenate([enc_inputs, goal], axis=-1), tasks

    @nn.compact
    def __call__(self, observations, tasks=None, train: bool = True):
        matched_obs = regex_filter(
            self.obs_stack_keys, sorted(observations.keys())
        )
        if not matched_obs:
            logging.info(
                f"No image inputs matching {self.obs_stack_keys} found; "
                "skipping."
            )
            assert self.proper_pad_mask, (
                "Cannot skip unless using proper_pad_mask."
            )
            return None

        enc_inputs = _gather_matching(observations, matched_obs, min_rank=4)
        if self.task_stack_keys:
            enc_inputs, tasks = self._stack_task_channels(
                enc_inputs, observations, tasks
            )

        b, t = enc_inputs.shape[:2]
        frames = enc_inputs.reshape(b * t, *enc_inputs.shape[2:])

        encoder_kwargs = {}
        if self.task_film_keys:
            film = _gather_matching(tasks, self.task_film_keys)
            encoder_kwargs["cond_var"] = (
                film[:, None].repeat(t, axis=1).reshape(b * t, -1)
            )

        tokens = ModuleSpec.instantiate(self.encoder)()(
            frames, **encoder_kwargs
        )
        tokens = tokens.reshape(b, t, -1, tokens.shape[-1])
        if self.use_token_learner:
            tokens = TokenLearner(num_tokens=self.num_tokens)(
                tokens, train=train
            )

        if self.proper_pad_mask:
            mask = generate_proper_pad_mask(
                tokens, observations.get("pad_mask_dict", None), matched_obs
            )
        else:
            mask = jnp.ones(tokens.shape[:-1])
        return TokenGroup(tokens, mask)


class LanguageTokenizer(nn.Module):
    """Embeds text input IDs into continuous language embeddings.

    `encoder` names a text encoder config ("t5-base" etc.); the encoder
    module is our native T5 implementation, registered under the submodule
    name `hf_model` to keep the reference's checkpoint layout.
    """

    encoder: str = None
    proper_pad_mask: bool = True
    finetune_encoder: bool = False

    def setup(self):
        if self.encoder is not None:
            from hypervla_tpu.models.encoders.t5 import (
                T5EncoderModel,
                t5_config,
            )

            self.hf_model = T5EncoderModel(config=t5_config(self.encoder))

    def __call__(self, observations, tasks=None, train: bool = True):
        if "language_instruction" not in tasks:
            logging.warning(
                "No language inputs found. Skipping tokenizer entirely."
            )
            assert self.proper_pad_mask, (
                "Cannot skip unless using proper pad mask."
            )
            return None

        instruction = tasks["language_instruction"]
        if isinstance(instruction, (jax.Array, np.ndarray)):
            # precomputed embeddings; give single vectors a token axis
            tokens = (
                instruction[:, None, :] if instruction.ndim == 2
                else instruction
            )
        else:
            assert self.encoder is not None, (
                "Received language tokens but no encoder specified."
            )
            tokens = self.hf_model(
                input_ids=instruction["input_ids"],
                attention_mask=instruction["attention_mask"],
            )

        if not self.finetune_encoder:
            tokens = jax.lax.stop_gradient(tokens)

        if self.proper_pad_mask:
            mask = generate_proper_pad_mask(
                tokens,
                tasks.get("pad_mask_dict", None),
                ("language_instruction",),
            )
        else:
            mask = jnp.ones(tokens.shape[:-1])
        return TokenGroup(tokens, mask)


class BinTokenizer(nn.Module):
    """Dimension-wise binning of continuous values into n_bins tokens;
    "uniform" spaces bin edges linearly on [low, high], "normal" places
    them at equal-probability-mass quantiles of a standard normal."""

    bin_type: str = "uniform"
    n_bins: int = 256
    low: float = -1.0
    high: float = 1.0

    def setup(self):
        if self.bin_type == "uniform":
            edges = jnp.linspace(self.low, self.high, self.n_bins + 1)
        elif self.bin_type == "normal":
            edges = norm.ppf(jnp.linspace(EPS, 1 - EPS, self.n_bins + 1))
        else:
            raise ValueError(f"Binning type {self.bin_type} not supported.")
        self.thresholds = edges

    def __call__(self, inputs):
        if self.bin_type == "uniform":
            inputs = jnp.clip(inputs, self.low + EPS, self.high - EPS)
        # interior-edge searchsorted == the reference's one-hot interval
        # test for in-range values; out-of-range values fall to token 0
        # exactly like the reference's all-false argmax
        token = jnp.searchsorted(
            self.thresholds[1:-1], inputs, side="right"
        )
        in_range = (inputs >= self.thresholds[0]) & (
            inputs < self.thresholds[-1]
        )
        return jnp.where(in_range, token, 0).astype(jnp.int32)

    def decode(self, inputs):
        centers = (self.thresholds[1:] + self.thresholds[:-1]) / 2
        return centers[inputs]


class LowdimObsTokenizer(BinTokenizer):
    """Tokenizer for non-spatial observations, optionally discretized."""

    obs_keys: Sequence[str] = tuple()
    proper_pad_mask: bool = True
    discretize: bool = False

    def __call__(self, observations, *unused_args, **unused_kwargs):
        assert self.obs_keys, "Need to specify observation keys to tokenize."
        matched = []
        for pattern in self.obs_keys:
            matched += [
                k for k in sorted(observations.keys())
                if re.compile(pattern).match(k)
            ]
        if not matched:
            logging.warning(
                f"No observation inputs matching {self.obs_keys} found; "
                "skipping."
            )
            assert self.proper_pad_mask, (
                "Cannot skip unless using proper pad mask."
            )
            return None
        for key in matched:
            assert observations[key].ndim == 3, (
                f"Only non-spatial inputs supported; {key} has shape "
                f"{observations[key].shape}."
            )
        values = _gather_matching(observations, matched)
        if self.discretize:
            tokens = jax.nn.one_hot(super().__call__(values), self.n_bins)
        else:
            tokens = values[..., None]
        return TokenGroup(tokens, jnp.ones(tokens.shape[:-1]))
