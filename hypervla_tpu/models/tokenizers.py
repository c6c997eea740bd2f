"""Observation/task tokenizers (parity: octo/model/components/tokenizers.py).

The LanguageTokenizer wraps OUR native T5 encoder (hypervla_tpu.models.encoders.t5)
rather than a HuggingFace module — same math, TPU-friendly implementation —
but keeps the `hf_model` submodule name so param trees stay familiar.
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


def generate_proper_pad_mask(
    tokens: jax.Array,
    pad_mask_dict: Optional[Dict[str, jax.Array]],
    keys: Sequence[str],
) -> jax.Array:
    if pad_mask_dict is None:
        logging.warning("No pad_mask_dict found. Nothing will be masked.")
        return jnp.ones(tokens.shape[:-1])
    if not all(key in pad_mask_dict for key in keys):
        logging.warning(
            f"pad_mask_dict missing keys {set(keys) - set(pad_mask_dict.keys())}."
            " Nothing will be masked."
        )
        return jnp.ones(tokens.shape[:-1])
    pad_mask = jnp.stack([pad_mask_dict[key] for key in keys], axis=-1)
    pad_mask = jnp.any(pad_mask, axis=-1)
    return jnp.broadcast_to(pad_mask[..., None], tokens.shape[:-1])


class TokenLearner(nn.Module):
    """Maps a token sequence to a fixed number of learned tokens via MAP."""

    num_tokens: int

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (inputs.shape[-2], inputs.shape[-1]),
        )
        x = inputs + jnp.broadcast_to(pos_embed, inputs.shape)
        x = nn.LayerNorm()(x)
        return MAPHead(num_readouts=self.num_tokens)(x, train=train)


def regex_match(regex_keys, x):
    return any(re.match(r_key, x) for r_key in regex_keys)


def regex_filter(regex_keys, xs):
    return list(filter(lambda x: regex_match(regex_keys, x), xs))


class ImageTokenizer(nn.Module):
    """Stacks matching image observation/task channels and runs a conv encoder."""

    encoder: ModuleSpec
    use_token_learner: bool = False
    num_tokens: int = 8
    conditioning_type: str = "none"
    obs_stack_keys: Sequence[str] = ("image_.*", "depth_.*")
    task_stack_keys: Sequence[str] = tuple()
    task_film_keys: Sequence[str] = tuple()
    proper_pad_mask: bool = True

    @nn.compact
    def __call__(self, observations, tasks=None, train: bool = True):
        def extract_inputs(keys, inputs, check_spatial=False):
            extracted = []
            for key in keys:
                if check_spatial:
                    assert len(inputs[key].shape) >= 4
                extracted.append(inputs[key])
            return jnp.concatenate(extracted, axis=-1)

        obs_stack_keys = regex_filter(self.obs_stack_keys, sorted(observations.keys()))
        if len(obs_stack_keys) == 0:
            logging.info(
                f"No image inputs matching {self.obs_stack_keys} found; skipping."
            )
            assert self.proper_pad_mask, "Cannot skip unless using proper_pad_mask."
            return None

        enc_inputs = extract_inputs(obs_stack_keys, observations, check_spatial=True)
        if self.task_stack_keys:
            needed_task_keys = regex_filter(self.task_stack_keys, observations.keys())
            for k in needed_task_keys:
                if k not in tasks:
                    logging.info(f"No task inputs matching {k}; zero-padding.")
                    tasks = flax.core.copy(
                        tasks, {k: jnp.zeros_like(observations[k][:, 0])}
                    )
            task_stack_keys = regex_filter(self.task_stack_keys, sorted(tasks.keys()))
            if len(task_stack_keys) == 0:
                raise ValueError(
                    f"No task inputs matching {self.task_stack_keys} were found."
                )
            task_inputs = extract_inputs(task_stack_keys, tasks, check_spatial=True)
            task_inputs = task_inputs[:, None].repeat(enc_inputs.shape[1], axis=1)
            enc_inputs = jnp.concatenate([enc_inputs, task_inputs], axis=-1)
        b, t, h, w, c = enc_inputs.shape
        enc_inputs = jnp.reshape(enc_inputs, (b * t, h, w, c))

        encoder_input_kwargs = {}
        if self.task_film_keys:
            film_inputs = extract_inputs(self.task_film_keys, tasks)
            film_inputs = film_inputs[:, None].repeat(t, axis=1)
            encoder_input_kwargs.update(
                {"cond_var": jnp.reshape(film_inputs, (b * t, -1))}
            )

        encoder_def = ModuleSpec.instantiate(self.encoder)()
        image_tokens = encoder_def(enc_inputs, **encoder_input_kwargs)
        image_tokens = jnp.reshape(image_tokens, (b, t, -1, image_tokens.shape[-1]))

        if self.use_token_learner:
            image_tokens = TokenLearner(num_tokens=self.num_tokens)(
                image_tokens, train=train
            )

        if self.proper_pad_mask:
            pad_mask = generate_proper_pad_mask(
                image_tokens, observations.get("pad_mask_dict", None), obs_stack_keys
            )
        else:
            pad_mask = jnp.ones(image_tokens.shape[:-1])
        return TokenGroup(image_tokens, pad_mask)


class LanguageTokenizer(nn.Module):
    """Embeds text input IDs into continuous language embeddings.

    `encoder` names a text encoder config ("t5-base" etc.); the encoder module
    is our native T5 implementation, registered under the submodule name
    `hf_model` to keep the checkpoint layout of the reference.
    """

    encoder: str = None
    finetune_encoder: bool = False
    proper_pad_mask: bool = True

    def setup(self):
        if self.encoder is not None:
            from hypervla_tpu.models.encoders.t5 import T5EncoderModel, t5_config

            self.hf_model = T5EncoderModel(config=t5_config(self.encoder))

    def __call__(self, observations, tasks=None, train: bool = True):
        if "language_instruction" not in tasks:
            logging.warning("No language inputs found. Skipping tokenizer entirely.")
            assert self.proper_pad_mask, "Cannot skip unless using proper pad mask."
            return None

        if not isinstance(tasks["language_instruction"], (jax.Array, np.ndarray)):
            assert (
                self.encoder is not None
            ), "Received language tokens but no encoder specified."
            tokens = self.hf_model(
                input_ids=tasks["language_instruction"]["input_ids"],
                attention_mask=tasks["language_instruction"]["attention_mask"],
            )
        else:
            if tasks["language_instruction"].ndim == 2:
                tokens = tasks["language_instruction"][:, None, :]
            else:
                tokens = tasks["language_instruction"]

        if not self.finetune_encoder:
            tokens = jax.lax.stop_gradient(tokens)

        if self.proper_pad_mask:
            pad_mask = generate_proper_pad_mask(
                tokens, tasks.get("pad_mask_dict", None), ("language_instruction",)
            )
        else:
            pad_mask = jnp.ones(tokens.shape[:-1])
        return TokenGroup(tokens, pad_mask)


class BinTokenizer(nn.Module):
    """Dimension-wise binning of continuous values into n_bins tokens."""

    n_bins: int = 256
    bin_type: str = "uniform"
    low: float = -1
    high: float = 1

    def setup(self):
        if self.bin_type == "uniform":
            self.thresholds = jnp.linspace(self.low, self.high, self.n_bins + 1)
        elif self.bin_type == "normal":
            self.thresholds = norm.ppf(jnp.linspace(EPS, 1 - EPS, self.n_bins + 1))
        else:
            raise ValueError(f"Binning type {self.bin_type} not supported.")

    def __call__(self, inputs):
        if self.bin_type == "uniform":
            inputs = jnp.clip(inputs, self.low + EPS, self.high - EPS)
        inputs = inputs[..., None]
        token_one_hot = (inputs < self.thresholds[1:]) & (
            inputs >= self.thresholds[:-1]
        ).astype(jnp.uint8)
        return jnp.argmax(token_one_hot, axis=-1)

    def decode(self, inputs):
        one_hot = jax.nn.one_hot(inputs, self.n_bins)
        bin_avgs = (self.thresholds[1:] + self.thresholds[:-1]) / 2
        return jnp.sum(one_hot * bin_avgs, axis=-1)


class LowdimObsTokenizer(BinTokenizer):
    """Tokenizer for non-spatial observations, optionally discretized."""

    obs_keys: Sequence[str] = tuple()
    discretize: bool = False
    proper_pad_mask: bool = True

    def __call__(self, observations, *unused_args, **unused_kwargs):
        assert self.obs_keys, "Need to specify observation keys to tokenize."
        if len(regex_filter(self.obs_keys, sorted(observations.keys()))) == 0:
            logging.warning(
                f"No observation inputs matching {self.obs_keys} found; skipping."
            )
            assert self.proper_pad_mask, "Cannot skip unless using proper pad mask."
            return None

        tokenizer_inputs = []
        for o_key in self.obs_keys:
            for key in filter(re.compile(o_key).match, sorted(observations.keys())):
                assert len(observations[key].shape) == 3, (
                    f"Only non-spatial inputs supported; {key} has shape "
                    f"{observations[key].shape}."
                )
                tokenizer_inputs.append(observations[key])
        tokenizer_inputs = jnp.concatenate(tokenizer_inputs, axis=-1)
        if self.discretize:
            tokenized_inputs = super().__call__(tokenizer_inputs)
            tokens = jax.nn.one_hot(tokenized_inputs, self.n_bins)
        else:
            tokens = tokenizer_inputs[..., None]
        mask = jnp.ones(tokens.shape[:-1])
        return TokenGroup(tokens, mask)
