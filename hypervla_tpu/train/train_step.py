"""The single-jit GSPMD training step.

TPU-native re-design of the reference's `train_step_pmap`
(scripts/train.py:405-542): one `jax.jit` over a ("data", "fsdp") mesh
replaces pmap+replicate+lax.pmean — XLA inserts the gradient all-reduces from
the sharding annotations, the TrainState is donated (no per-device copies),
and the EMA update happens inside the step instead of a host-side pickle
loop. Behavioral parity preserved:

  * in-step frozen T5 instruction embedding (+ rephrase strategies) and
    DINOv2 initial-image encoding;
  * per-sample vmapped loss: one hypernet forward per sample generates that
    sample's base-net params, then the base net's loss runs under those
    params (generated-weights-as-activations);
  * auxiliary losses: attention-entropy and (annealed) DINO attention-map
    alignment;
  * weight-decay strategies incl. v4 (decoupled WD as a separate clipped
    gradient) and delta-decay of fine-tuned DINO params toward the
    pretrained values;
  * per-task loss logging via boolean masks.
"""
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from hypervla_tpu.train.train_state import TrainState


def make_train_step(
    model,
    config: Dict[str, Any],
    tx,
    lr_callable: Callable,
    base_lr_callable: Callable,
    param_norm_callable: Callable,
    text_encode: Optional[Callable] = None,
    dino_encode: Optional[Callable] = None,
    pretrained_params: Optional[Any] = None,
    mesh=None,
    donate: bool = True,
):
    """Builds the jitted train step.

    text_encode(t5_params, input_ids, attention_mask) -> token embeddings
        (frozen T5); its params arrive per-call via `encoder_params["t5"]` so
        the ~440MB of frozen weights are step ARGUMENTS, not HLO constants.
    dino_encode(dino_params, images) -> DINOv2 patch embeddings for initial
        images (params via `encoder_params["dino"]`).
    pretrained_params: original DINOv2 params (pytree) for delta-decay.
    """
    hk = config["hypernet_kwargs"]
    vit_kwargs = config["base_net_kwargs"]["vit_kwargs"]
    aux = config["auxiliary_loss"]
    opt_cfg = config["optimizer"]
    use_initial_image = hk.get("use_initial_image", False)
    num_steps = config.get("num_steps", 100000)
    ema_decay = config.get("EMA_decay", 0.999)
    ema_start = config.get("EMA_start_step", 0)

    generation_flag = model.hypernet.base_net_metadata["generation_flag"]

    # Hoist the SHARED image trunk's forward out of the per-sample vmap:
    # under vmap the closed-over trunk's weight gradients lower to
    # per-sample multiply+reduce fusions on the VPU (~15 ms of the 163 ms
    # bs=64 step, round-3 profile); batched outside the vmap they are
    # ordinary MXU matmuls. The trunk does not depend on the sample's task,
    # so the per-sample loss consumes injected patch embeddings instead
    # (ViT._patchify honors them). Opt-in via config["hoist_shared_trunk"].
    hoist_trunk = bool(
        config.get("hoist_shared_trunk", False)
        and config["base_net_kwargs"].get("model_type") == "vit"
        and vit_kwargs.get("encoder_type") in ("DINOv2", "CLIP")
        and float(vit_kwargs.get("image_embedding_noise", 0.0)) == 0.0
        and not vit_kwargs.get("sow_dino_attention", False)
        and "image_encoder" in tuple(hk.get("shared_modules") or ())
    )
    if (vit_kwargs.get("dino_layers_impl") == "pallas_train"
            and not hoist_trunk):
        # inside the per-sample vmap a closed-over weight's cotangent
        # materializes per-sample ([B, 3072, 768] instead of [3072, 768]);
        # the layer kernel's batch-grid accumulation only exists outside it
        raise ValueError(
            "dino_layers_impl='pallas_train' requires the hoisted trunk: "
            "set config['hoist_shared_trunk']=True (and keep "
            "sow_dino_attention=False, image_embedding_noise=0, "
            "image_encoder shared)"
        )

    def _trunk_embed(trunk_tree, images):
        return model.base_net.apply(
            {"params": {"encoder": {"image_encoder": trunk_tree}}},
            images,
            True,
            method=lambda mdl, images, train: (
                mdl.encoder._pretrained_embeddings(images, train)
            ),
        )

    # Delta-decay name table, derived from the WeightPlan: the plan records
    # both the canonical flat name of every base-net block and where the
    # shared pretrained image-encoder subtree sits, so each pretrained leaf
    # maps to its hypernet shared-param leaf without constructing name
    # strings here (VERDICT r2 item 9).
    delta_decay_names = None
    if pretrained_params is not None:
        md = model.hypernet.base_net_metadata
        block_path = md.get("pretrained_block_path")
        if block_path is None:
            raise ValueError(
                "pretrained_params given but the WeightPlan has no "
                "pretrained image-encoder block (encoder_type must be "
                "DINOv2 or CLIP for delta-decay)"
            )
        delta_decay_names = md["flat_name"]
        for key in block_path:
            delta_decay_names = delta_decay_names[key]

    # device-side augmentation: when dataset_kwargs.device_augment is set, the
    # host pipeline only decodes + resizes (cheap) and the full augmentation
    # chain runs here, fused into the step's XLA program (frees the host CPU —
    # the usual pipeline bottleneck on single-core TPU VMs)
    _aug_specs = {}
    if config["dataset_kwargs"].get("device_augment", False):
        ak = config["dataset_kwargs"].get("image_augment_kwargs") or {}
        if ak:
            _aug_specs = {"primary": ak} if "augment_order" in ak else dict(ak)

    def sample_loss_fn(params, sample_data, dropout_rng, step):
        sample_data = jax.tree_util.tree_map(
            lambda x: jnp.expand_dims(x, 0), sample_data
        )
        initial_states = sample_data["initial_state"] if use_initial_image else None
        # broadcast_shared=False: shared blocks (e.g. the 86M-param DINOv2)
        # come back WITHOUT a batch axis, so under vmap they are closed-over
        # constants instead of per-sample copies — shared-weight matmuls stay
        # ordinary gemms on the MXU
        dict_base_params, _ = model.hypernet.apply(
            {"params": params},
            sample_data["task"],
            train=True,
            initial_states=initial_states,
            rngs={"dropout": dropout_rng},
            broadcast_shared=False,
        )
        import flax

        dict_base_params = flax.core.unfreeze(dict_base_params)
        dict_base_params = jax.tree_util.tree_map(
            lambda p, gen: p.squeeze(0) if gen else p,
            dict_base_params,
            generation_flag,
        )
        if vit_kwargs["encoder_type"] == "EfficientNet":
            dropout_rng, drop_connect_rng = jax.random.split(dropout_rng)
            rngs = {"dropout": dropout_rng, "drop_connect": drop_connect_rng}
        elif vit_kwargs.get("image_embedding_noise", 0.0) > 0.0:
            dropout_rng, embedding_noise_rng = jax.random.split(dropout_rng)
            rngs = {"dropout": dropout_rng, "embedding_noise": embedding_noise_rng}
        else:
            rngs = {"dropout": dropout_rng}
        bound = model.base_net.bind({"params": dict_base_params}, rngs=rngs)
        loss, metrics, attention_map = bound.loss(sample_data, train=True)

        if aux.get("attention_entropy", 0.0) > 0.0:
            attention_prob = attention_map[:, :, -1]
            log_prob = jnp.log(attention_prob + 1e-8)
            per_head_entropy = -jnp.sum(attention_prob * log_prob, axis=-1)
            entropy_loss = jnp.mean(per_head_entropy)
            loss = loss + aux["attention_entropy"] * entropy_loss
            metrics["attention_entropy_loss"] = jax.lax.stop_gradient(entropy_loss)

        if aux.get("attention_map_alignment", 0.0) > 0.0:
            policy_map = attention_map[:, :, -1, :-1]
            reference_map = jax.lax.stop_gradient(
                sample_data["observation"]["DINO_last_layer_attention_map"][
                    :, :, 0, 1:
                ]
            )
            alignment_loss = (
                (policy_map.mean(1) - reference_map.mean(1)) ** 2
            ).mean()
            annealing = 1.0 - step / num_steps
            loss = loss + annealing * aux["attention_map_alignment"] * alignment_loss
            metrics["attention_alignment_loss"] = jax.lax.stop_gradient(
                alignment_loss
            )

        metrics["base_params_norm"] = optax.global_norm(dict_base_params)
        return loss, metrics

    def sample_weight_decay_loss(params, sample_data, dropout_rng):
        sample_data = jax.tree_util.tree_map(
            lambda x: jnp.expand_dims(x, 0), sample_data
        )
        initial_states = sample_data["initial_state"] if use_initial_image else None
        dict_base_params, _ = model.hypernet.apply(
            {"params": params},
            sample_data["task"],
            train=True,
            initial_states=initial_states,
            rngs={"dropout": dropout_rng},
            broadcast_shared=False,
        )
        import flax

        dict_base_params = flax.core.unfreeze(dict_base_params)
        dict_base_params = jax.tree_util.tree_map(
            lambda p, gen: p.squeeze(0) if gen else p,
            dict_base_params,
            generation_flag,
        )
        mask = jax.tree_util.tree_map_with_path(
            lambda path, _: "kernel" in jax.tree_util.keystr(path),
            dict_base_params,
        )
        sq = jax.tree_util.tree_map(
            lambda p, m: (p**2).sum() * m, dict_base_params, mask
        )
        return 0.5 * sum(jax.tree_util.tree_leaves(sq))

    def train_step(state: TrainState, batch, task_index=None,
                   encoder_params=None, with_metrics=True):
        # with_metrics=False skips the logging-only global norms (grad/
        # update/param norm — ~0.75 ms/step device time at bs=8); the
        # trainer only computes them on steps it actually logs
        encoder_params = encoder_params or {}
        if _aug_specs:
            from hypervla_tpu.ops.preprocess import fused_resize_augment

            aug_rng = jax.random.fold_in(state.rng, 1)
            for cam, kw in _aug_specs.items():
                obs_key = f"image_{cam}"
                if obs_key not in batch["observation"]:
                    continue
                imgs = batch["observation"][obs_key]
                b, w = imgs.shape[:2]
                flat = imgs.reshape((b * w,) + imgs.shape[2:])
                aug_rng, sub = jax.random.split(aug_rng)
                flat = fused_resize_augment(
                    flat, sub, flat.shape[1:3], dict(kw), train=True
                )
                batch["observation"][obs_key] = flat.reshape(imgs.shape)

        rephrase_strategy = aux.get("rephrase_strategy", None)
        if text_encode is not None:
            t5_params = encoder_params["t5"]
            if rephrase_strategy == "replace" and "rephrased_task" in batch:
                emb = text_encode(
                    t5_params,
                    batch["rephrased_task"]["language_instruction"]["input_ids"],
                    batch["rephrased_task"]["language_instruction"][
                        "attention_mask"
                    ],
                )
                batch["task"]["language_instruction"] = dict(
                    batch["rephrased_task"]["language_instruction"],
                    token_embedding=jax.lax.stop_gradient(emb),
                )
            else:
                emb = text_encode(
                    t5_params,
                    batch["task"]["language_instruction"]["input_ids"],
                    batch["task"]["language_instruction"]["attention_mask"],
                )
                batch["task"]["language_instruction"]["token_embedding"] = (
                    jax.lax.stop_gradient(emb)
                )
        if use_initial_image and dino_encode is not None:
            patch = dino_encode(encoder_params["dino"],
                                batch["initial_state"]["image_primary"].squeeze(1))
            batch["initial_state"]["patch_embeddings"] = jax.lax.stop_gradient(
                patch
            )
        # feeds primed with embed=False (trainer._prime_example_batch) DROP
        # the precomputed embeddings, expecting this step to recompute them
        # in-graph — a caller that also omits the encoder closures would
        # otherwise hit a bare KeyError deep in the model (ADVICE r4)
        if "token_embedding" not in batch["task"]["language_instruction"]:
            raise ValueError(
                "batch has no task token_embedding and no text_encode "
                "closure was passed to make_train_step: either prime the "
                "batch with embeddings (embed=True) or provide the frozen "
                "T5 encoder (trainer.build_frozen_encoders)"
            )
        if use_initial_image and "patch_embeddings" not in batch.get(
            "initial_state", {}
        ):
            raise ValueError(
                "batch has no initial_state patch_embeddings and no "
                "dino_encode closure was passed to make_train_step: either "
                "prime the batch (embed=True) or provide the frozen DINOv2 "
                "encoder (trainer.build_frozen_encoders)"
            )

        rng, dropout_rng = jax.random.split(state.rng)
        batch_size = batch["action"].shape[0]
        dropout_rngs = jax.random.split(dropout_rng, batch_size)

        def _loss_fn(params):
            loss_batch = batch
            if hoist_trunk:
                from hypervla_tpu.models.hypernetwork import (
                    rebuild_shared_subtree,
                )

                trunk_tree = rebuild_shared_subtree(
                    params, model.hypernet.base_net_metadata
                )
                emb = _trunk_embed(
                    trunk_tree,
                    batch["observation"]["image_primary"].squeeze(1),
                )
                loss_batch = dict(
                    batch,
                    observation=dict(
                        batch["observation"], patch_embeddings=emb
                    ),
                )
            losses, metrics = jax.vmap(
                sample_loss_fn, in_axes=(None, 0, 0, None)
            )(params, loss_batch, dropout_rngs, state.step)
            task_metrics = {}
            if task_index is not None:
                for task_name in task_index:
                    task_metrics[f"task_loss_{task_name}"] = (
                        losses * task_index[task_name]
                    ).sum()
            return losses.mean(), (metrics, task_metrics)

        (loss_mean, (metrics, task_metrics)), grads = jax.value_and_grad(
            _loss_fn, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)

        # delta-decay: pull fine-tuned DINO params toward pretrained values
        if (
            vit_kwargs.get("fine_tune_pretrained_image_encoder", False)
            and opt_cfg.get("base_weight_decay", 0.0) > 0
            and pretrained_params is not None
        ):
            coefficient = base_lr_callable(state.step) * opt_cfg[
                "base_weight_decay"
            ]

            def delta_change_decay(path, p):
                names = delta_decay_names
                for x in path:
                    names = names[x.key]
                updates[names] = updates[names] + coefficient * p.ravel()

            jax.tree_util.tree_map_with_path(
                delta_change_decay, pretrained_params
            )

        info = {}
        if opt_cfg.get("weight_decay_strategy", "v1") == "v4":
            wd_losses, wd_grads = jax.vmap(
                jax.value_and_grad(sample_weight_decay_loss),
                in_axes=(None, 0, 0),
            )(state.params, batch, dropout_rngs)
            wd_grads = jax.tree_util.tree_map(
                lambda g: g.mean(axis=0), wd_grads
            )
            wd_grad_norm = optax.global_norm(wd_grads)
            clip = opt_cfg["clip_gradient"]
            wd_updates = jax.tree_util.tree_map(
                lambda x: x / wd_grad_norm * jnp.minimum(wd_grad_norm, clip),
                wd_grads,
            )
            coefficient = lr_callable(state.step) * aux["base_weight_decay"]
            wd_updates = jax.tree_util.tree_map(
                lambda x: coefficient * x, wd_updates
            )
            updates = jax.tree_util.tree_map(
                lambda x, y: x - y, updates, wd_updates
            )
            info["base_weight_decay_grad_norm"] = wd_grad_norm

        info.update(
            training_loss=loss_mean,
            learning_rate=lr_callable(state.step),
        )
        if with_metrics:
            info.update(
                grad_norm=optax.global_norm(grads),
                update_norm=optax.global_norm(updates),
                param_norm=param_norm_callable(state.params),
            )
        if task_index is not None:
            for task_name in task_index:
                task_loss = task_metrics[f"task_loss_{task_name}"]
                denom = jnp.maximum(task_index[task_name].sum(), 1)
                info[f"task_loss_{task_name}"] = task_loss / denom
        info.update(
            jax.tree_util.tree_map(lambda x: x.mean(), metrics)
        )

        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None:
            started = state.step >= ema_start
            new_ema = jax.tree_util.tree_map(
                lambda e, p: jnp.where(
                    started, ema_decay * e + (1.0 - ema_decay) * p, p
                ),
                state.ema_params,
                new_params,
            )

        new_state = state.replace(
            params=new_params,
            opt_state=new_opt_state,
            rng=rng,
            step=state.step + 1,
            ema_params=new_ema,
        )
        return new_state, info

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums,
                   static_argnames=("with_metrics",))
