"""ml_collections config for HyperVLA pretraining (CLI parity with the
reference's scripts/configs/hypervla_pretrain_config.py).

Usage: --config scripts/configs/hypervla_pretrain_config.py:vit_t,oxe
"""
from ml_collections import ConfigDict

from hypervla_tpu.configs import flagship_pretrain_config, pretrain_config


def get_config(config_string: str = "vit_t,oxe"):
    tokens = config_string.split(",")
    fast = "fast" in tokens
    tokens = [t for t in tokens if t != "fast"]
    model_size, dataset = (tokens + ["oxe"])[:2]
    if model_size == "vit_t" and dataset == "oxe":
        config = flagship_pretrain_config()
    else:
        config = pretrain_config(model_size)
    config["dataset_kwargs"]["dataset"] = dataset
    if dataset == "oxe":
        config["dataset_kwargs"].setdefault("oxe_mix", "oxe_magic_soup")
        config["dataset_kwargs"].setdefault("data_dir", "")
        config["dataset_kwargs"].setdefault("skip_unlabeled", True)
    else:
        # single-dataset branches (metaworld / libero / google_robot / fixture)
        config["dataset_kwargs"]["oxe_mix"] = None
        config["dataset_kwargs"].setdefault("data_dir", "")
        config["dataset_kwargs"].setdefault("dataset_kwargs_list", [])
    if fast:
        # "vit_t,oxe,fast": the measured TPU fast path (PERF.md) — bf16
        # trunk, MXU-dot LN/softmax reductions, hoisted shared trunk
        from hypervla_tpu.configs import apply_fast_training_preset

        apply_fast_training_preset(config)
    return ConfigDict(config)
