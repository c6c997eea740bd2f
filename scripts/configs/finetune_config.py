"""Fine-tuning config (parity: scripts/configs/finetune_config.py).

Modes select which parameters train:
    full          - everything
    head_only     - only the action-head output blocks of the hypernet
    head_mlp_only - action head + transformer MLP blocks

Usage: --config scripts/configs/finetune_config.py:vit_t,libero
"""
from ml_collections import ConfigDict

from hypervla_tpu.configs import flagship_pretrain_config


FROZEN_KEYS_BY_MODE = {
    "full": tuple(),
    "head_only": (
        "*task_token_projection*",
        "*initial_image_projection*",
        "*context_encoder*",
        "*encoder_Transformer*",
        "*encoder_image_*",
        "*pos_embedding*",
    ),
    "head_mlp_only": (
        "*task_token_projection*",
        "*initial_image_projection*",
        "*context_encoder*",
        "*encoder_image_*",
        "*pos_embedding*",
    ),
}


def get_config(config_string: str = "vit_t,libero"):
    parts = config_string.split(",")
    model_size = parts[0] if parts else "vit_t"
    dataset = parts[1] if len(parts) > 1 else "libero"
    mode = parts[2] if len(parts) > 2 else "full"
    assert mode in FROZEN_KEYS_BY_MODE, f"unknown finetune mode {mode}"

    config = flagship_pretrain_config()
    config["num_steps"] = 10000
    config["save_interval"] = 2000
    config["eval_interval"] = 2000
    config["EMA_start_step"] = 1000
    config["optimizer"].update(
        learning_rate={
            "name": "cosine",
            "init_value": 0.0,
            "peak_value": 1e-4,
            "warmup_steps": 500,
            "decay_steps": 10000,
        },
        frozen_keys=FROZEN_KEYS_BY_MODE[mode],
        grad_accumulation_steps=1,
    )
    config["dataset_kwargs"].update(
        dataset=dataset,
        oxe_mix=None,
        batch_size=64,
        shuffle_buffer_size=10000,
        dataset_kwargs_list=[],
    )
    # fine-tuning warm-starts from the pretrained EMA checkpoint
    config["pretrained_checkpoint_path"] = None
    config["pretrained_checkpoint_step"] = None
    config["finetune_mode"] = mode
    return ConfigDict(config)
