"""Measure the REFERENCE trainer's training-step throughput on this chip.

This is the denominator for the ">=2x reference pretraining throughput"
north star (BASELINE.json): it executes the reference's OWN model, optimizer,
and per-step semantics — `train_step_pmap` from
/root/reference/scripts/train.py:405-542 with the flagship README recipe
(README.md:17-63: DINOv2-base shared+fine-tuned encoder, in-step t5-base
instruction embedding, in-step DINO initial-image encode, per-sample
vmap(hypernet -> base-net loss), lax.pmean, AdamW v5, per-step host EMA) —
on the same device the repo's own trainer is measured on (PERF.md).

Faithfulness notes:
- The reference model/optimizer code is IMPORTED from /root/reference and
  run as-is; only the step function body is re-stated here because the
  reference defines it as a closure inside main() (not importable). Branches
  that are statically off in the flagship recipe (attention-entropy /
  alignment aux losses, v4 WD, delta decay at base_weight_decay=0, rephrase)
  are omitted — XLA would have pruned them anyway.
- t5/DINO weights are random at the pinned real architectures (no egress);
  FLOPs and shapes are identical to the pretrained weights.
- t5/DINO params are passed as pmap broadcast ARGS instead of closure
  captures: semantically identical, but closure-captured constants of this
  size exceed the tunneled backend's compile-request limit. On a local chip
  the reference's capture would behave the same as args.
- The per-step host work the reference's loop does every iteration
  (device-axis reshape, metric unreplicate, EMA update) is included, since
  it is part of the reference's sustained throughput.

Usage: python -m scripts.bench_reference --batch 8 --steps 10 [--tiny]
Writes one JSON line with wall ms/step (min + median) and samples/s.
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10, help="timed steps/trial")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny encoders on CPU (smoke test)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu or args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from scripts import reference_shims

    if args.tiny:
        reference_shims.install(dino_hidden=32, dino_layers=2, dino_heads=2,
                                dino_image_size=224)
    else:
        reference_shims.install()

    import flax
    import jax.numpy as jnp
    import optax
    from flax import jax_utils as flax_utils

    from hypervla_tpu.configs import flagship_pretrain_config, tiny_test_config
    from hypervla_tpu.flagship import make_flagship_batch

    # ---- flagship config, filtered to the reference's API surface ----
    if args.tiny:
        config = tiny_test_config(encoder_type="DINOv2")
        config["hypernet_kwargs"]["use_initial_image"] = True
    else:
        config = flagship_pretrain_config()
    # this framework's vit_kwargs extensions the reference ViT doesn't know
    for k in ("pretrained_encoder_name", "encoder_dtype", "use_flash_attention",
              "sow_dino_attention", "scan_dino_layers", "fused_layer_norm", "remat_dino",
              "flash_attention_trainable"):
        config["base_net_kwargs"]["vit_kwargs"].pop(k, None)
    config["auxiliary_loss"]["rephrase_strategy"] = None  # same FLOPs: one
    # t5 encode of the (non-rephrased) instruction per step, train.py:415

    from hypervla.model import HyperVLA as RefHyperVLA  # noqa: E402
    from octo.model.components.tokenizers import LanguageTokenizer  # noqa
    from octo.utils.train_utils import TrainState, create_optimizer  # noqa
    from transformers import FlaxDinov2Model  # noqa: E402

    instr_len = 8 if args.tiny else 32
    image_size = 224  # the reference's DINOv2 ViT asserts 224x224 inputs
    token_dim = 768
    initial_patch_dim = 32 if args.tiny else 768
    batch = make_flagship_batch(
        batch_size=args.batch, instr_len=instr_len, image_size=image_size,
        token_dim=token_dim, initial_patch_dim=initial_patch_dim,
        action_horizon=config["base_net_kwargs"]["action_horizon"],
    )

    # ---- reference setup: scripts/train.py:167-299 ----
    rng = jax.random.PRNGKey(config["seed"])
    language_token_encoder = LanguageTokenizer("t5-base", finetune_encoder=False)
    dummy_task = {
        "language_instruction": {
            "input_ids": np.ones((1, 16), dtype=np.int32),
            "attention_mask": np.ones((1, 16)),
        }
    }
    t5_params = language_token_encoder.init(
        rng, dict(), dummy_task, train=False
    )["params"]
    # (random t5 weights; hf_weights_loader needs egress. FLOPs identical.)

    pretrained_image_encoder = FlaxDinov2Model.from_pretrained(
        "facebook/dinov2-base"
    )
    dino_module = pretrained_image_encoder.module
    dino_params = pretrained_image_encoder.params

    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:2], batch)
    model = RefHyperVLA.from_config(config, example, rng=jax.random.PRNGKey(0))
    # pipeline batches carry only input_ids/attention_mask; token_embedding
    # and patch_embeddings are produced in-step (train.py:407-419)
    del batch["task"]["language_instruction"]["token_embedding"]
    del batch["initial_state"]["patch_embeddings"]

    def check_param_type(path, _):
        return "shared" if "image_encoder" in path[0].key else "generated"

    HN_param_type = jax.tree_util.tree_map_with_path(
        check_param_type, model.params
    )
    tx, lr_callable, base_lr_callable, param_norm_callable = create_optimizer(
        model.params, HN_param_type, **config["optimizer"]
    )
    train_state = TrainState.create(rng, model, tx)
    train_state = flax_utils.replicate(train_state)  # train.py:323-324

    use_initial_image = config["hypernet_kwargs"].get("use_initial_image", False)

    # ---- the reference step: scripts/train.py:326-542, flagship branches ----
    def sample_loss_fn(params, sample_data, dropout_rng, step):
        sample_data = jax.tree_util.tree_map(
            lambda x: jnp.expand_dims(x, 0), sample_data
        )
        initial_states = (
            sample_data["initial_state"] if use_initial_image else None
        )
        dict_base_params, context_embedding = model.hypernet.apply(
            {"params": params}, sample_data["task"], train=True,
            initial_states=initial_states, rngs={"dropout": dropout_rng},
        )
        dict_base_params = jax.tree_util.tree_map(
            lambda p: p.squeeze(0), dict_base_params
        )
        bound = model.base_net.bind(
            {"params": dict_base_params}, rngs={"dropout": dropout_rng}
        )
        loss, metrics, _ = bound.loss(sample_data, train=True)
        metrics["base_params_norm"] = optax.global_norm(dict_base_params)
        return loss, metrics

    from functools import partial

    @partial(jax.pmap, axis_name="batch", donate_argnums=(0,),
             in_axes=(0, 0, None, None))
    def train_step_pmap(state, batch, t5_params, dino_params):
        batch["task"]["language_instruction"]["token_embedding"] = (
            language_token_encoder.apply(
                {"params": t5_params}, dict(), batch["task"], train=True
            ).tokens
        )
        if use_initial_image:
            raw = batch["initial_state"]["image_primary"].squeeze(1) / 255.0
            mean = jnp.array([0.485, 0.456, 0.406])
            std = jnp.array([0.229, 0.224, 0.225])
            raw = (raw - mean[None, None, None]) / std[None, None, None]
            # (the reference transposes to NCHW for the HF *wrapper*, which
            # transposes straight back to NHWC for the flax module we call)
            dino_out = dino_module.apply({"params": dino_params}, raw)
            batch["initial_state"]["patch_embeddings"] = jax.lax.stop_gradient(
                dino_out.last_hidden_state
            )
        rng, dropout_rng = jax.random.split(state.rng)
        per_device_bs = batch["action"].shape[0]
        dropout_rngs = jax.random.split(dropout_rng, per_device_bs)

        def _loss_fn(params):
            losses, metrics = jax.vmap(
                sample_loss_fn, in_axes=(None, 0, 0, None)
            )(params, batch, dropout_rngs, state.step)
            return losses.mean(), metrics

        (losses, metrics), grads = jax.value_and_grad(
            _loss_fn, has_aux=True
        )(state.model.params)
        grads = jax.lax.pmean(grads, axis_name="batch")
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.model.params
        )
        grad_norm = optax.global_norm(grads)
        update_norm = optax.global_norm(updates)
        losses_mean = jax.lax.pmean(losses, axis_name="batch")
        info = {
            "training_loss": losses_mean,
            "grad_norm": grad_norm,
            "update_norm": update_norm,
            "param_norm": param_norm_callable(state.model.params),
            "learning_rate": lr_callable(state.step),
        }
        metrics_mean = jax.tree_util.tree_map(lambda x: x.mean(), metrics)
        info.update(
            jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis_name="batch"), metrics_mean
            )
        )
        new_params = optax.apply_updates(state.model.params, updates)
        new_model = state.model.replace(params=new_params)
        new_state = state.replace(
            model=new_model, opt_state=new_opt_state, rng=rng,
            step=state.step + 1,
        )
        return new_state, info

    @jax.jit
    def compute_params_EMA(old, params):  # train.py:618-625
        return {
            "EMA_0.999": jax.tree_util.tree_map(
                lambda x, y: 0.999 * x + 0.001 * y, old["EMA_0.999"], params
            )
        }

    num_devices = 1
    per_device_bs = args.batch // num_devices

    def one_step(state, batch_np, ema):
        # per-step host work from the reference loop (train.py:627-690)
        dev_batch = jax.tree_util.tree_map(
            lambda x: x.reshape(num_devices, per_device_bs, *x.shape[1:]),
            batch_np,
        )
        state, info = train_step_pmap(state, dev_batch, t5_params, dino_params)
        info = flax_utils.unreplicate(info)
        ema = compute_params_EMA(
            ema, flax_utils.unreplicate(state.model.params)
        )
        return state, info, ema

    ema = {
        "EMA_0.999": jax.tree_util.tree_map(
            lambda x: jnp.array(x[0]), train_state.model.params
        )
    }

    t5_params = jax.device_put(t5_params)
    dino_params = jax.device_put(dino_params)

    print(f"compiling (bs={args.batch}) ...", flush=True)
    t0 = time.time()
    for _ in range(max(1, args.warmup)):
        train_state, info, ema = one_step(train_state, batch, ema)
    jax.block_until_ready((train_state.model.params, info))
    print(
        f"warmup done in {time.time() - t0:.1f}s, "
        f"loss={float(info['training_loss']):.4f}",
        flush=True,
    )

    per_step_ms = []
    for trial in range(args.trials):
        t0 = time.time()
        for _ in range(args.steps):
            train_state, info, ema = one_step(train_state, batch, ema)
        jax.block_until_ready((train_state.model.params, info, ema))
        dt = (time.time() - t0) / args.steps * 1e3
        per_step_ms.append(dt)
        print(f"trial {trial}: {dt:.1f} ms/step "
              f"({args.batch / dt * 1e3:.1f} samples/s)", flush=True)

    best = min(per_step_ms)
    med = float(np.median(per_step_ms))
    result = {
        "metric": "reference train step (flagship recipe, train_step_pmap)",
        "batch": args.batch,
        "ms_per_step_best": round(best, 2),
        "ms_per_step_median": round(med, 2),
        "samples_per_sec_best": round(args.batch / best * 1e3, 1),
        "samples_per_sec_median": round(args.batch / med * 1e3, 1),
        "device": str(jax.devices()[0]),
        "loss": float(info["training_loss"]),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
