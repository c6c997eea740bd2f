"""Original-Octo pretraining config (parity: scripts/configs/octo_pretrain_config.py).

Usage: --config scripts/configs/octo_pretrain_config.py:vit_s,oxe
"""
from ml_collections import ConfigDict

from hypervla_tpu.configs import pretrain_config
from hypervla_tpu.models.transformer import common_transformer_sizes
from hypervla_tpu.models.vit_encoders import SmallStem16
from hypervla_tpu.utils.spec import ModuleSpec


def get_config(config_string: str = "vit_s,oxe"):
    model_size, dataset = (config_string.split(",") + ["oxe"])[:2]
    token_embedding_size, transformer_kwargs = common_transformer_sizes(
        model_size
    )
    config = pretrain_config(model_size)
    config["model_class"] = "octo"
    config["model"] = {
        "observation_tokenizers": {
            "primary": ModuleSpec.create(
                "hypervla_tpu.models.tokenizers:ImageTokenizer",
                obs_stack_keys=["image_primary"],
                task_stack_keys=["image_primary"],
                encoder=ModuleSpec.create(SmallStem16),
            ),
        },
        "heads": {
            "action": ModuleSpec.create(
                "hypervla_tpu.models.action_heads:DiffusionActionHead",
                readout_key="readout_action",
                use_map=False,
                action_horizon=4,
                action_dim=7,
                n_diffusion_samples=1,
            ),
        },
        "readouts": {"action": 1},
        "token_embedding_size": token_embedding_size,
        "transformer_kwargs": {**transformer_kwargs, "learnable_norm": True},
        "max_horizon": 10,
        "repeat_task_tokens": True,
        "use_correct_attention": True,
    }
    config["dataset_kwargs"]["dataset"] = dataset
    if dataset == "oxe":
        config["dataset_kwargs"].setdefault("oxe_mix", "oxe_magic_soup")
        config["dataset_kwargs"].setdefault("data_dir", "")
    return ConfigDict(config)
