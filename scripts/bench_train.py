"""Benchmark THIS framework's flagship train step at large batch sizes.

Companion to scripts/bench_reference.py (the >=2x north-star denominator):
runs the real single-jit GSPMD train step — in-step frozen T5 embed +
DINOv2 initial-image encode, per-sample vmapped hypernet + base-net loss,
AdamW v5, in-state EMA — on synthetic batches at the flagship README recipe,
including the batch-256 configuration (real batch or grad-accumulation).

Usage:
  python -m scripts.bench_train --batch 32                 # one step = bs32
  python -m scripts.bench_train --batch 32 --accum 8       # recipe bs=256
  python -m scripts.bench_train --batch 256                # real bs=256
Writes one JSON line with ms/step and samples/s (effective batch / optimizer
update for accum runs).
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32, help="per-step batch")
    ap.add_argument("--accum", type=int, default=1,
                    help="grad accumulation steps (effective batch = "
                         "batch * accum)")
    ap.add_argument("--steps", type=int, default=10,
                    help="optimizer updates per trial")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize DINO layers (fit bigger real batches)")
    ap.add_argument("--remat-policy", type=str, default=None,
                    help="DINO layer jax.checkpoint policy: dots | "
                         "dots_no_batch | nothing (dots = keep MXU outputs, "
                         "recompute elementwise backward)")
    ap.add_argument("--dtype", type=str, default=None,
                    help="trunk compute dtype override (e.g. bfloat16)")
    ap.add_argument("--fast", action="store_true",
                    help="apply the full fast-training preset "
                         "(bf16 + dot LN + dot softmax + hoisted trunk)")
    ap.add_argument("--fused-attn", action="store_true",
                    help="fused Pallas MHA in the trunk "
                         "(vit_kwargs.dino_fused_attention)")
    ap.add_argument("--layer-kernel", action="store_true",
                    help="every DINO layer as ONE Pallas custom call fwd+bwd"
                         " (ops/dino_layer_train.py); implies hoisted trunk")
    ap.add_argument("--frozen-kernel", action="store_true",
                    help="no-residual layer-kernel forward for the FROZEN "
                         "conditioning encoder only (keeps the XLA trunk "
                         "for the differentiated path)")
    ap.add_argument("--dot-softmax", action="store_true",
                    help="attention softmax with MXU sum reductions")
    ap.add_argument("--hoist-trunk", action="store_true",
                    help="hoist the shared DINO trunk forward out of the "
                         "per-sample vmap (weight grads become MXU matmuls)")
    ap.add_argument("--ln", type=str, default=None,
                    help="trunk LayerNorm impl: 'dot' = MXU ones-dot "
                         "statistics with the custom-VJP backward "
                         "(ops/layer_norm.py::layer_norm_dot)")
    ap.add_argument("--fused-add-ln", action="store_true",
                    help="fuse every trunk residual add into the LayerNorm "
                         "that consumes it (ops/add_layer_norm.py)")
    ap.add_argument("--packed", action="store_true",
                    help="packed flat-group AdamW (optimizer.packed=True)")
    ap.add_argument("--flash", action="store_true",
                    help="differentiable flash attention in the DINO trunk")
    ap.add_argument("--profile", type=str, default=None,
                    help="directory for a jax.profiler trace of one step")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from hypervla_tpu.flagship import build_flagship, make_flagship_batch
    from hypervla_tpu.utils.jax_utils import initialize_compilation_cache

    initialize_compilation_cache()
    from hypervla_tpu.parallel.mesh import create_mesh, replicated, shard_batch
    from hypervla_tpu.train.optimizer import (
        create_optimizer,
        hn_param_type_tree,
    )
    from hypervla_tpu.train.train_state import TrainState
    from hypervla_tpu.train.train_step import make_train_step
    from hypervla_tpu.train.trainer import build_frozen_encoders

    model, _ = build_flagship(
        tiny=args.tiny, training=True, encoder_dtype=args.dtype
    )
    config = model.config
    tiny_batch_kwargs = dict(
        instr_len=8, action_horizon=2, initial_patch_dim=32, image_size=224
    )
    if args.flash:
        config["base_net_kwargs"]["vit_kwargs"]["use_flash_attention"] = True
        config["base_net_kwargs"]["vit_kwargs"][
            "flash_attention_trainable"
        ] = True
        config["base_net_kwargs"]["vit_kwargs"]["sow_dino_attention"] = False
    if args.fast:
        from hypervla_tpu.configs import apply_fast_training_preset

        apply_fast_training_preset(config)
    if args.layer_kernel:
        vk = config["base_net_kwargs"]["vit_kwargs"]
        vk["dino_layers_impl"] = "pallas_train"
        vk["dino_fused_attention"] = False  # the layer kernel subsumes it
        vk["sow_dino_attention"] = False
        config["hoist_shared_trunk"] = True
    if args.frozen_kernel:
        config["frozen_encoder_layer_kernel"] = True
    if (args.remat or args.flash or args.remat_policy or args.ln
            or args.dot_softmax or args.fused_attn or args.fused_add_ln
            or args.fast or args.layer_kernel):
        if args.remat:
            config["base_net_kwargs"]["vit_kwargs"]["remat_dino"] = True
        if args.remat_policy:
            config["base_net_kwargs"]["vit_kwargs"]["dino_remat_policy"] = (
                args.remat_policy
            )
        if args.ln:
            config["base_net_kwargs"]["vit_kwargs"]["fused_layer_norm"] = (
                args.ln if args.ln != "pallas" else True
            )
        if args.dot_softmax:
            config["base_net_kwargs"]["vit_kwargs"]["dino_dot_softmax"] = True
        if args.fused_attn:
            config["base_net_kwargs"]["vit_kwargs"][
                "dino_fused_attention"
            ] = True
        if args.fused_add_ln:
            config["base_net_kwargs"]["vit_kwargs"][
                "dino_fused_add_ln"
            ] = True
            config["base_net_kwargs"]["vit_kwargs"][
                "sow_dino_attention"
            ] = False
        from hypervla_tpu.models.hypervla import HyperVLA

        model = HyperVLA.from_config(
            config,
            make_flagship_batch(
                batch_size=1, **(tiny_batch_kwargs if args.tiny else {})
            ),
            jax.random.PRNGKey(0),
        )
        config = model.config
    config["optimizer"]["grad_accumulation_steps"] = args.accum
    if args.hoist_trunk:
        config["hoist_shared_trunk"] = True
    if args.packed:
        config["optimizer"]["packed"] = True

    text_apply, dino_apply, t5_params, dino_params = build_frozen_encoders(
        config
    )

    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    state = TrainState.create(
        jax.random.PRNGKey(0), model.params, tx,
        track_ema=config.get("save_param_EMA", True),
    )
    mesh = create_mesh()
    state = jax.device_put(state, replicated(mesh))
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn,
        text_encode=text_apply, dino_encode=dino_apply, mesh=mesh,
    )
    encoder_params = jax.device_put(
        {"t5": t5_params, "dino": dino_params}, replicated(mesh)
    )

    batch_kwargs = tiny_batch_kwargs if args.tiny else {}
    batch = make_flagship_batch(batch_size=args.batch, **batch_kwargs)
    # the step embeds instructions / initial images itself
    del batch["task"]["language_instruction"]["token_embedding"]
    del batch["initial_state"]["patch_embeddings"]
    staged = shard_batch(batch, mesh)
    micro_per_update = args.accum
    effective_batch = args.batch * args.accum

    def one_update(state):
        # steady-state semantics: the trainer computes the logging-only
        # global norms only on log steps (with_metrics=step_will_log)
        for _ in range(micro_per_update):
            state, info = step_fn(
                state, staged, {}, encoder_params, with_metrics=False
            )
        return state, info

    print(
        f"compiling (bs={args.batch}, accum={args.accum}, "
        f"effective={effective_batch}) ...", flush=True,
    )
    t0 = time.time()
    for _ in range(max(1, args.warmup)):
        state, info = one_update(state)
    jax.block_until_ready(info)
    print(
        f"warmup done in {time.time() - t0:.1f}s, "
        f"loss={float(info['training_loss']):.4f}", flush=True,
    )

    per_update_ms = []
    for trial in range(args.trials):
        t0 = time.time()
        for _ in range(args.steps):
            state, info = one_update(state)
        jax.block_until_ready(info)
        dt = (time.time() - t0) / args.steps * 1e3
        per_update_ms.append(dt)
        print(
            f"trial {trial}: {dt:.1f} ms/update "
            f"({effective_batch / dt * 1e3:.1f} samples/s)", flush=True,
        )

    if args.profile:
        with jax.profiler.trace(args.profile):
            state, info = one_update(state)
            jax.block_until_ready(info)
        print(f"profile written to {args.profile}")

    best, med = min(per_update_ms), float(np.median(per_update_ms))
    print(json.dumps({
        "metric": "flagship train step (single-jit GSPMD)",
        "trunk_dtype": config["base_net_kwargs"]["vit_kwargs"].get(
            "encoder_dtype", "float32"
        ),
        "remat_policy": args.remat_policy,
        "ln": args.ln,
        "hoist_trunk": args.hoist_trunk,
        "dot_softmax": args.dot_softmax,
        "fused_attn": args.fused_attn,
        "fused_add_ln": args.fused_add_ln,
        "layer_kernel": args.layer_kernel,
        "frozen_kernel": args.frozen_kernel,
        "fast_preset": args.fast,
        "batch": args.batch,
        "grad_accumulation_steps": args.accum,
        "effective_batch": effective_batch,
        "ms_per_update_best": round(best, 2),
        "ms_per_update_median": round(med, 2),
        "samples_per_sec_best": round(effective_batch / best * 1e3, 1),
        "samples_per_sec_median": round(effective_batch / med * 1e3, 1),
        "device": str(jax.devices()[0]),
        "loss": float(info["training_loss"]),
    }), flush=True)


if __name__ == "__main__":
    main()
