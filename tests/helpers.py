"""Shared test fixtures: synthetic example batches matching the data contract."""
import numpy as np


def make_example_batch(
    batch_size=1,
    window=1,
    image_size=256,
    action_horizon=2,
    action_dim=7,
    instr_len=8,
    token_dim=768,
    initial_image=False,
    initial_patch_tokens=257,
    initial_patch_dim=768,
    seed=0,
):
    rng = np.random.RandomState(seed)
    batch = {
        "observation": {
            "image_primary": rng.randint(
                0, 255, (batch_size, window, image_size, image_size, 3)
            ).astype(np.uint8),
            "timestep_pad_mask": np.ones((batch_size, window), dtype=bool),
        },
        "task": {
            "language_instruction": {
                "input_ids": rng.randint(
                    2, 100, (batch_size, instr_len)
                ).astype(np.int32),
                "attention_mask": np.ones(
                    (batch_size, instr_len), dtype=np.int32
                ),
                "token_embedding": rng.randn(
                    batch_size, instr_len, token_dim
                ).astype(np.float32),
            },
            "pad_mask_dict": {
                "language_instruction": np.ones(batch_size, dtype=bool),
            },
        },
        "action": rng.randn(batch_size, window, action_horizon, action_dim).astype(
            np.float32
        ),
        "action_pad_mask": np.ones(
            (batch_size, window, action_horizon, action_dim), dtype=bool
        ),
    }
    if initial_image:
        batch["initial_state"] = {
            "image_primary": batch["observation"]["image_primary"].copy(),
            "patch_embeddings": rng.randn(
                batch_size, initial_patch_tokens, initial_patch_dim
            ).astype(np.float32),
        }
    return batch
