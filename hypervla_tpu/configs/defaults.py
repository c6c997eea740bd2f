"""Config builders.

Plain nested-dict equivalents of the reference's ml_collections configs
(scripts/configs/config.py + hypervla_pretrain_config.py). `pretrain_config`
reproduces the defaults; `flagship_pretrain_config` applies the README's
vit_t,oxe training recipe (/root/reference/README.md:17-63);
`tiny_test_config` shrinks everything for CPU unit tests.
"""
import copy
from typing import Any, Dict

from hypervla_tpu.models.transformer import common_transformer_sizes


def pretrain_config(transformer_size: str = "vit_t") -> Dict[str, Any]:
    token_embedding_size, transformer_kwargs = common_transformer_sizes(
        transformer_size
    )
    return {
        "seed": 42,
        "num_steps": 300000,
        "window_size": 1,
        "save_interval": 10000,
        "eval_interval": 5000,
        "log_interval": 100,
        "save_param_EMA": False,
        "EMA_start_step": 5000,
        "EMA_decay": 0.999,
        "pretrained_checkpoint_path": None,
        "pretrained_checkpoint_step": None,
        "model": {
            "readouts": {"action": 1},
            "token_embedding_size": token_embedding_size,
            "transformer_kwargs": {**transformer_kwargs, "learnable_norm": True},
            "max_horizon": 10,
            "repeat_task_tokens": True,
            "use_pretrained_image_tokenizer": False,
            "observation_tokenizers": {},
        },
        "optimizer": {
            "learning_rate": {
                "name": "rsqrt",
                "init_value": 0.0,
                "peak_value": 3e-4,
                "warmup_steps": 2000,
                "timescale": 10000,
            },
            "base_learning_rate": {
                "name": "rsqrt",
                "init_value": 0.0,
                "peak_value": 3e-5,
                "warmup_steps": 2000,
                "timescale": 10000,
            },
            "weight_decay": 0.1,
            "base_weight_decay": 0.0,
            "weight_decay_strategy": "v1",
            "clip_gradient": 1.0,
            "frozen_keys": tuple(),
            "grad_accumulation_steps": 1,
        },
        "hypernet_kwargs": {
            "encoder_type": "transformer",
            "context_embedding_dim": 128,
            "context_encoder_kwargs": {
                "num_layers": 1,
                "mlp_dim": 256,
                "num_attention_heads": 4,
                "dropout_rate": 0.0,
                "attention_dropout_rate": 0.0,
                "add_position_embedding": False,
            },
            "attend_to_padding": False,
            "task_attend_to_layer": False,
            "embedding_dropout_rate": 0.0,
            "scale_context_embedding": False,
            "output_head_bias": True,
            "generation_strategy": "full",
            "shared_modules": tuple(),
            "include_goal_image": False,
            "use_initial_image": False,
            "use_all_image_tokens": False,
            "share_TF_output_head": False,
            "init_strategy": 0,
            "share_all_params": False,
            "share_layer_index": False,
            "image_dropout": 0.0,
        },
        "base_net_kwargs": {
            "model_type": "cnn",
            "action_head_type": "diffusion",
            "action_horizon": 4,
            "action_dim": 7,
            "cnn_kwargs": {
                "kernel_sizes": (3, 3, 3, 3),
                "strides": (2, 2, 2, 2),
                "features": (32, 64, 128, 256),
                "padding": (1, 1, 1, 1),
                "mlp_hidden_sizes": (32, 32),
            },
            "vit_kwargs": {
                "encoder_type": "SmallStem",
                "patch_size": 16,
                "hidden_dim": 64,
                "num_layers": 4,
                "num_heads": 4,
                "mlp_dim": 128,
                "dropout_rate": 0.0,
                "cnn_channels": (32, 96, 192, 384),
                "use_language_token": False,
                "fine_tune_pretrained_image_encoder": False,
                "image_embedding_noise": 0.0,
                "use_differential_transformer": False,
                "return_attention_map": False,
                "add_positional_embedding": True,
                "include_class_token": False,
            },
            "action_head_kwargs": {
                "token_per_horizon": False,
                "squash_continuous_action": True,
                "tanh_scaling_factor": 5.0,
                "clip_target": False,
                "max_action": 5.0,
                "hidden_dims": tuple(),
                "discrete_token_type": "action_dim_and_action_horizon",
                "num_blocks": 3,
                "hidden_dim": 256,
                "diffusion_dropout_rate": 0.0,
                "loss_type": "mse",
            },
        },
        "auxiliary_loss": {
            "HN_regularizer": 0.0,
            "close_drawer_weight": 1.0,
            "attention_map_alignment": 0.0,
            "attention_entropy": 0.0,
            "rephrase_strategy": None,
            "rephrase_alignment_coef": 1.0,
        },
        "dataset_kwargs": {
            "batch_size": 256,
            "shuffle_buffer_size": 250000,
            "oxe_mix": "oxe_magic_soup",
            "text_tokenizer": "t5-base",
            "tokenizer_max_length": 32,
            "resize_size": {"primary": (224, 224)},
        },
    }


def flagship_pretrain_config() -> Dict[str, Any]:
    """The README vit_t,oxe recipe: DINOv2 base encoder shared + fine-tuned,
    block generation off one shared layer token, mix action head."""
    config = pretrain_config("vit_t")
    config["num_steps"] = 100000
    config["optimizer"].update(
        weight_decay_strategy="v5", weight_decay=0.05, base_weight_decay=0.0
    )
    config["hypernet_kwargs"].update(
        context_embedding_dim=128,
        context_encoder_kwargs={
            "num_layers": 6,
            "mlp_dim": 512,
            "num_attention_heads": 4,
            "dropout_rate": 0.0,
            "attention_dropout_rate": 0.0,
            "add_position_embedding": False,
        },
        scale_context_embedding=True,
        generation_strategy="block",
        attend_to_padding=False,
        embedding_dropout_rate=0.0,
        share_layer_index=True,
        shared_modules=("image_encoder",),
        use_initial_image=True,
        share_TF_output_head=False,
    )
    config["base_net_kwargs"].update(model_type="vit", action_head_type="mix")
    config["base_net_kwargs"]["vit_kwargs"].update(
        encoder_type="DINOv2",
        num_layers=4,
        hidden_dim=64,
        num_heads=4,
        mlp_dim=128,
        dropout_rate=0.0,
        use_differential_transformer=False,
        add_positional_embedding=True,
        use_language_token=False,
        fine_tune_pretrained_image_encoder=True,
    )
    config["base_net_kwargs"]["action_head_kwargs"].update(
        clip_target=True, squash_continuous_action=True, tanh_scaling_factor=5.0
    )
    config["auxiliary_loss"]["rephrase_strategy"] = "replace"
    config["save_param_EMA"] = True
    config["seed"] = 2025
    return config


def tiny_test_config(
    encoder_type: str = "SmallStem", action_head_type: str = "mix", **overrides
) -> Dict[str, Any]:
    """A shrunken config for CPU tests: tiny context encoder, tiny base net,
    tiny (test-registered) DINOv2 when encoder_type == 'DINOv2'."""
    config = pretrain_config("dummy")
    config["hypernet_kwargs"].update(
        context_embedding_dim=16,
        context_encoder_kwargs={
            "num_layers": 1,
            "mlp_dim": 32,
            "num_attention_heads": 2,
            "dropout_rate": 0.0,
            "attention_dropout_rate": 0.0,
            "add_position_embedding": False,
        },
        generation_strategy="block",
    )
    config["base_net_kwargs"].update(
        model_type="vit", action_head_type=action_head_type, action_horizon=2,
        action_dim=7,
    )
    config["base_net_kwargs"]["vit_kwargs"].update(
        encoder_type=encoder_type,
        hidden_dim=16,
        num_layers=2,
        num_heads=2,
        mlp_dim=32,
        cnn_channels=(32, 32, 32, 32),
    )
    if encoder_type == "DINOv2":
        config["hypernet_kwargs"].update(
            shared_modules=("image_encoder",),
            share_layer_index=True,
            use_initial_image=True,
            scale_context_embedding=True,
        )
        config["base_net_kwargs"]["vit_kwargs"][
            "pretrained_encoder_name"
        ] = "dinov2-test"
    hk_overrides = overrides.pop("hypernet_kwargs", {})
    config["hypernet_kwargs"].update(hk_overrides)
    config.update(copy.deepcopy(overrides))
    return config


def disable_unused_attention_capture(config):
    """Turns off DINO attention-map capture when nothing consumes it (no
    aux loss, no return_attention_map) — the maps cost 12 x (heads, 257,
    257) activations per sample kept for backward. Shared by the trainer
    and the benchmarks so the gating cannot drift."""
    aux = config["auxiliary_loss"]
    if (
        aux.get("attention_map_alignment", 0.0) == 0.0
        and aux.get("attention_entropy", 0.0) == 0.0
        and not config["base_net_kwargs"]["vit_kwargs"].get(
            "return_attention_map", False
        )
    ):
        config["base_net_kwargs"]["vit_kwargs"].setdefault(
            "sow_dino_attention", False
        )
    return config


def apply_fast_training_preset(config):
    """One-switch TPU training fast path: every lever that WON its on-chip
    A/B (PERF.md), numerics-safe at bf16-training level (the fp32 default
    config stays untouched for reference-parity goldens).

    - bfloat16 trunk compute (round 2: +18% at bs=32)
    - bf16 backward residuals via the custom-VJP exact GELU (round 3)
    - geometry-tuned fused Pallas MHA in the trunk (round 3: bs=64 step
      168.2 -> 150.0 ms, +12%; ops/fused_attention.py)
    - no-residual full-layer Pallas forward for the FROZEN conditioning
      encoder (round 4: eff-256 424.2 -> 448.5 samples/s median; the frozen
      encode is forward-only, so it takes ops/dino_layer_train.py's
      no-residual kernel while the differentiated trunk keeps the XLA path
      whose backward measured faster)
    - no unused attention capture

    Deliberately NOT included (each measured SLOWER than baseline at
    bs=64 bf16 in the round-3 on-chip bisection — see PERF.md):
    fused_ln="dot" (190.4 vs 182.8 ms), dino_dot_softmax (213.9 ms),
    hoist_shared_trunk (200.8 ms). The optimization_barrier fences those
    rewrites need force large intermediates (x*x, exp(x), per-sample
    probs) to materialize to HBM, costing more bandwidth than the VPU
    reduces they save. Also not included: dino_fused_add_ln (the
    structural residual-boundary Pallas kernel, 154.4 vs 152.0 ms on top
    of this preset — PERF.md bisection coda). All remain available as
    explicit opt-ins.
    """
    vk = config["base_net_kwargs"]["vit_kwargs"]
    vk["encoder_dtype"] = "bfloat16"
    vk["dino_fused_attention"] = True
    config["frozen_encoder_layer_kernel"] = True
    disable_unused_attention_capture(config)
    return config
