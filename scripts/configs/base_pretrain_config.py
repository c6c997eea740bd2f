"""BaseModel (no-hypernetwork ablation) pretraining config
(parity: scripts/configs/base_pretrain_config.py).

Usage: --config scripts/configs/base_pretrain_config.py:vit_t,oxe
"""
from ml_collections import ConfigDict

from hypervla_tpu.configs import flagship_pretrain_config


def get_config(config_string: str = "vit_t,oxe"):
    config = flagship_pretrain_config()
    # train the base net directly: every block is "shared" (learned, not
    # generated); the trainer detects model_class and skips the hypernet
    config["model_class"] = "base_model"
    config["hypernet_kwargs"]["share_all_params"] = True
    config["hypernet_kwargs"]["use_initial_image"] = False
    config["base_net_kwargs"]["vit_kwargs"][
        "fine_tune_pretrained_image_encoder"
    ] = True
    return ConfigDict(config)
