"""Eval-side model loading (parity: data/simpler/evaluate.py:60-105,438-444
and data/utils/language_tokenizer.py).

Builds an InferenceWrapper from a checkpoint (with optional EMA param swap)
and a text-encoding closure (tokenizer -> native T5 -> token embeddings)
matching the training-time instruction pathway.
"""
import logging
import os
import pickle
from typing import Optional

import jax
import numpy as np


def load_hypervla_policy(
    checkpoint_path: str,
    step: Optional[int] = None,
    policy_setup: str = "google_robot",
    image_size: int = 224,
    action_ensemble: bool = True,
    crop: bool = True,
    ema_decay: Optional[float] = 0.999,
    horizon: int = 1,
):
    """Loads a HyperVLA checkpoint into a closed-loop InferenceWrapper."""
    from hypervla_tpu.eval.inference import InferenceWrapper
    from hypervla_tpu.models.hypervla import HyperVLA

    model = HyperVLA.load_pretrained(checkpoint_path, step=step)
    if ema_decay is not None:
        ema_path = os.path.join(
            checkpoint_path, str(step or ""), "EMA_params.pkl"
        )
        if step is None:
            # latest step dir containing an EMA pickle
            candidates = sorted(
                (
                    d
                    for d in os.listdir(checkpoint_path)
                    if d.isdigit()
                    and os.path.exists(
                        os.path.join(checkpoint_path, d, "EMA_params.pkl")
                    )
                ),
                key=int,
            )
            if candidates:
                ema_path = os.path.join(
                    checkpoint_path, candidates[-1], "EMA_params.pkl"
                )
        if os.path.exists(ema_path):
            with open(ema_path, "rb") as f:
                ema_params = pickle.load(f)
            key = f"EMA_{ema_decay}"
            if key in ema_params:
                logging.info(f"Using {key} parameters from {ema_path}")
                model = model.replace(params=ema_params[key])

    action_horizon = model.config["base_net_kwargs"]["action_horizon"]
    return InferenceWrapper(
        model=model,
        policy_setup=policy_setup,
        horizon=horizon,
        pred_action_horizon=action_horizon,
        image_size=image_size,
        action_ensemble=action_ensemble,
        crop=crop,
    )


def build_text_encoder(model, tokenizer_name: str = "t5-base",
                       max_length: Optional[int] = None):
    """Returns encode(str | list[str]) -> instruction dict with token
    embeddings, using the native T5 encoder (+ pretrained weights if found).

    When `model` is a HyperVLA (or anything carrying an example_batch) the
    tokenizer max_length defaults to the instruction length the checkpoint
    was trained with — the hypernet's task positional embedding is sized to
    it, so a mismatched length fails at apply time.
    """
    import jax.numpy as jnp

    if max_length is None:
        try:
            max_length = int(
                model.example_batch["task"]["language_instruction"][
                    "input_ids"
                ].shape[-1]
            )
        except (AttributeError, KeyError, TypeError):
            max_length = 32

    from hypervla_tpu.data.text_processing import HFTokenizer
    from hypervla_tpu.models.encoders.pretrained import load_t5_weights
    from hypervla_tpu.models.encoders.t5 import T5EncoderModel, t5_config

    tokenizer = HFTokenizer(
        tokenizer_name=tokenizer_name,
        tokenizer_kwargs={
            "max_length": max_length,
            "padding": "max_length",
            "truncation": True,
            "return_tensors": "np",
        },
    )
    encoder = T5EncoderModel(config=t5_config(tokenizer_name))
    params = load_t5_weights(tokenizer_name)
    if params is None:
        ids = jnp.ones((1, max_length), dtype=jnp.int32)
        params = encoder.init(jax.random.PRNGKey(0), ids)["params"]

    # Params must be a jit ARGUMENT, not a closure capture: large captured
    # arrays get baked into the serialized computation and overflow the
    # remote-compile request limit on tunneled TPU backends.
    @jax.jit
    def _embed(params, input_ids, attention_mask):
        return encoder.apply(
            {"params": params}, input_ids, attention_mask
        )

    params = jax.device_put(params)

    def encode(strings):
        if isinstance(strings, (str, bytes)):
            strings = [strings]
        tokens = tokenizer.encode(strings)
        embedding = np.asarray(
            _embed(params, tokens["input_ids"], tokens["attention_mask"])
        )
        return {
            "language_instruction": {
                "input_ids": tokens["input_ids"],
                "attention_mask": tokens["attention_mask"],
                "token_embedding": embedding,
            }
        }

    return encode
