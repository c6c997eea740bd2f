"""Flagship model builder: the README vit_t,oxe recipe (DINOv2-base shared
image encoder, 6L/128d hypernet context encoder, 4L/64d generated policy ViT,
mix action head). Used by __graft_entry__.py and bench.py."""
from typing import Optional, Tuple

import jax
import numpy as np

from hypervla_tpu.configs import flagship_pretrain_config, tiny_test_config
from hypervla_tpu.models.hypervla import HyperVLA


def make_flagship_batch(
    batch_size: int = 1,
    instr_len: int = 32,
    image_size: int = 224,
    action_horizon: int = 4,
    action_dim: int = 7,
    token_dim: int = 768,
    initial_patch_dim: int = 768,
    seed: int = 0,
):
    rng = np.random.RandomState(seed)
    return {
        "observation": {
            "image_primary": rng.randint(
                0, 255, (batch_size, 1, image_size, image_size, 3)
            ).astype(np.uint8),
            "timestep_pad_mask": np.ones((batch_size, 1), dtype=bool),
        },
        "task": {
            "language_instruction": {
                "input_ids": rng.randint(2, 1000, (batch_size, instr_len)).astype(
                    np.int32
                ),
                "attention_mask": np.ones((batch_size, instr_len), dtype=np.int32),
                "token_embedding": rng.randn(
                    batch_size, instr_len, token_dim
                ).astype(np.float32),
            },
            "pad_mask_dict": {
                "language_instruction": np.ones(batch_size, dtype=bool)
            },
        },
        "action": rng.randn(
            batch_size, 1, action_horizon, action_dim
        ).astype(np.float32),
        "action_pad_mask": np.ones(
            (batch_size, 1, action_horizon, action_dim), dtype=bool
        ),
        "initial_state": {
            # 256 DINOv2 patches + cls token
            "image_primary": rng.randint(
                0, 255, (batch_size, 1, image_size, image_size, 3)
            ).astype(np.uint8),
            "patch_embeddings": rng.randn(
                batch_size, 257, initial_patch_dim
            ).astype(np.float32),
        },
    }


def build_flagship(
    tiny: bool = False,
    seed: int = 0,
    encoder_dtype: Optional[str] = None,
    serving: bool = False,
    training: bool = False,
    vit_overrides: Optional[dict] = None,
) -> Tuple[HyperVLA, dict]:
    """Builds the flagship HyperVLA model (or a tiny topological twin for
    CPU dry runs) plus a matching example batch."""
    if tiny:
        config = tiny_test_config(encoder_type="DINOv2")
        batch = make_flagship_batch(
            instr_len=8, action_horizon=2, initial_patch_dim=32
        )
    else:
        config = flagship_pretrain_config()
        batch = make_flagship_batch()
    if encoder_dtype is not None:
        config["base_net_kwargs"]["vit_kwargs"]["encoder_dtype"] = encoder_dtype
    if training:
        from hypervla_tpu.configs.defaults import (
            disable_unused_attention_capture,
        )

        disable_unused_attention_capture(config)
    if serving:
        # fastest per-step path at bs=1: XLA einsum attention, no
        # attention-map capture. Profiler-measured (PERF.md): the Pallas
        # flash kernel is a PESSIMIZATION at bs=1/seq=257 (pads to 384,
        # 12 x 44us = 0.53 ms/step vs ~0.25 for the einsum path) — flash
        # pays off at larger batch/sequence, not here. scan_dino_layers
        # likewise measured slower; left off.
        config["base_net_kwargs"]["vit_kwargs"].update(
            use_flash_attention=False, sow_dino_attention=False
        )
    if vit_overrides:
        # A/B experiment hook (profilers, benches): raw vit_kwargs overrides
        config["base_net_kwargs"]["vit_kwargs"].update(vit_overrides)
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(seed))
    return model, batch
