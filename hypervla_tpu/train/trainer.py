"""The training driver (parity: scripts/train.py, re-designed for TPU).

One GSPMD program: the batch is sharded over the ("data", "fsdp") mesh, the
TrainState lives on device and is donated through the jitted step, frozen
T5/DINOv2 encoders run inside the step, and the EMA is tracked in-state.
wandb logging, per-task loss masks, save/validation callbacks, and resume
mirror the reference trainer's behavior.
"""
import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypervla_tpu.data.text_processing import HFTokenizer
from hypervla_tpu.models.hypervla import HyperVLA
from hypervla_tpu.parallel.mesh import create_mesh, replicated, shard_batch
from hypervla_tpu.train.callbacks import SaveCallback, ValidationCallback
from hypervla_tpu.train.optimizer import create_optimizer, hn_param_type_tree
from hypervla_tpu.train.train_state import TrainState
from hypervla_tpu.train.train_step import make_train_step
from hypervla_tpu.utils.timer import Timer

DRAWER_TASKS = (b"close top drawer", b"close middle drawer",
                b"close bottom drawer")


def build_frozen_encoders(config: Dict[str, Any]):
    """Builds the frozen T5 text encoder and DINOv2 image encoder apply
    functions used inside the train step (parity: scripts/train.py:167-194).

    The returned functions take their params EXPLICITLY as the first argument
    — `text_apply(t5_params, ids, mask)`, `dino_apply(dino_params, images)` —
    so the (hundreds of MB of) frozen weights travel through the jitted train
    step as device-resident arguments, NOT as constants baked into the HLO.
    Closure-captured params bloat the serialized program (and exceed remote
    compile-service payload limits)."""
    from hypervla_tpu.models.encoders.pretrained import load_t5_weights
    from hypervla_tpu.models.encoders.t5 import T5EncoderModel, t5_config

    tokenizer_name = config["dataset_kwargs"].get("text_tokenizer", "t5-base")
    text_model = T5EncoderModel(config=t5_config(tokenizer_name))
    t5_params = load_t5_weights(tokenizer_name)
    if t5_params is None:
        max_len = config["dataset_kwargs"].get("tokenizer_max_length", 32)
        ids = jnp.ones((1, max_len), dtype=jnp.int32)
        t5_params = text_model.init(jax.random.PRNGKey(0), ids)["params"]

    def text_apply(params, input_ids, attention_mask):
        return text_model.apply({"params": params}, input_ids, attention_mask)

    dino_apply = None
    dino_params = None
    if config["hypernet_kwargs"].get("use_initial_image", False):
        from hypervla_tpu.models.base_vit import DINO_IMAGE_MEAN, DINO_IMAGE_STD
        from hypervla_tpu.models.encoders.dinov2 import (
            DINOv2Model,
            dinov2_config,
        )

        name = config["base_net_kwargs"]["vit_kwargs"].get(
            "pretrained_encoder_name", "dinov2-base"
        )
        # the frozen conditioning encoder follows the trunk compute dtype:
        # its output is stop_gradient'd hypernet conditioning, so bf16 here
        # is numerically safe and halves the encode's MXU/HBM cost
        # the frozen conditioning encoder mirrors the trunk's compute dtype
        # and LayerNorm impl: its output is stop_gradient'd hypernet
        # conditioning, so the bf16 / MXU-dot-LN fast paths are safe here
        # and it runs inside the same jitted train step
        dino_model = DINOv2Model(
            config=dinov2_config(name),
            dtype=jnp.dtype(
                config["base_net_kwargs"]["vit_kwargs"].get(
                    "encoder_dtype", "float32"
                )
            ),
            fused_ln=config["base_net_kwargs"]["vit_kwargs"].get(
                "fused_layer_norm", False
            ),
            # the frozen encode is never differentiated, so the full-layer
            # Pallas kernel runs its cheap no-residual forward here — a
            # measured win on its own (28.6 vs 31.7 ms at bs=64, PERF.md
            # round 4) even when the differentiated trunk keeps the XLA
            # path; config["frozen_encoder_layer_kernel"] enables it
            # independently of vit_kwargs.dino_layers_impl
            # (pallas_serving is a bs=1 inference layout — never valid here)
            layers_impl=(
                "pallas_train"
                if (
                    config.get("frozen_encoder_layer_kernel", False)
                    or config["base_net_kwargs"]["vit_kwargs"].get(
                        "dino_layers_impl"
                    ) == "pallas_train"
                )
                and config["base_net_kwargs"]["vit_kwargs"].get(
                    "encoder_dtype"
                ) == "bfloat16"
                # kernel geometry: 128-lane head slabs (test/tiny encoders
                # fall back to the XLA forward)
                and dinov2_config(name).hidden_size % 128 == 0
                and not dinov2_config(name).use_swiglu_ffn
                else None
            ),
        )
        image_size = config["dataset_kwargs"].get(
            "resize_size", {"primary": (224, 224)}
        )["primary"]
        dummy = jnp.zeros((1, *image_size, 3), dtype=jnp.float32)
        dino_params = dino_model.init(jax.random.PRNGKey(0), dummy)["params"]
        from hypervla_tpu.models.encoders.pretrained import _find_msgpack, _load_msgpack

        path = _find_msgpack(name)
        if path is not None:
            dino_params = _load_msgpack(path)

        def dino_apply(params, images):
            raw = images.astype(jnp.float32) / 255.0
            mean = jnp.array(DINO_IMAGE_MEAN)
            std = jnp.array(DINO_IMAGE_STD)
            raw = (raw - mean[None, None, None]) / std[None, None, None]
            out = dino_model.apply({"params": params}, raw)
            return out.last_hidden_state

    return text_apply, dino_apply, t5_params, dino_params


def make_process_batch(config: Dict[str, Any]):
    """Host-side batch prep: tokenize instruction strings, keep the raw
    strings for per-task logging (parity: octo/utils/train_utils.py:518-536)."""
    tokenizer = HFTokenizer(
        tokenizer_name=config["dataset_kwargs"].get("text_tokenizer", "t5-base"),
        tokenizer_kwargs={
            "max_length": config["dataset_kwargs"].get("tokenizer_max_length", 32),
            "padding": "max_length",
            "truncation": True,
            "return_tensors": "np",
        },
    )

    def process_batch(batch):
        task = batch["task"]
        if "language_instruction" in task and not isinstance(
            task["language_instruction"], dict
        ):
            strings = [
                s if isinstance(s, bytes) else bytes(s)
                for s in np.asarray(task["language_instruction"]).reshape(-1)
            ]
            tokens = tokenizer.encode(strings)
            task["instruction_string"] = np.asarray(strings, dtype=object)
            task["language_instruction"] = dict(tokens)
        if "rephrased_task" in batch and not isinstance(
            batch["rephrased_task"]["language_instruction"], dict
        ):
            strings = [
                s if isinstance(s, bytes) else bytes(s)
                for s in np.asarray(
                    batch["rephrased_task"]["language_instruction"]
                ).reshape(-1)
            ]
            batch["rephrased_task"]["language_instruction"] = dict(
                tokenizer.encode(strings)
            )
        return batch

    return process_batch


def make_train_datasets(config: Dict[str, Any], train: bool = True):
    """Builds the training data iterator from the config: either an OXE mix
    or a directory of fixture/native datasets."""
    from hypervla_tpu.data.dataset import make_interleaved_dataset
    from hypervla_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights

    dk = config["dataset_kwargs"]
    traj_kwargs = dict(
        window_size=config.get("window_size", 1),
        action_horizon=config["base_net_kwargs"]["action_horizon"],
        skip_unlabeled=dk.get("skip_unlabeled", False),
        max_action_dim=config["base_net_kwargs"]["action_dim"],
    )
    frame_kwargs = dict(
        resize_size=dk.get("resize_size", {"primary": (224, 224)}),
        # with device_augment, the host only decodes+resizes; the augmentation
        # chain runs fused inside the jitted train step (ops/preprocess.py)
        image_augment_kwargs=(
            {} if dk.get("device_augment", False)
            else dk.get("image_augment_kwargs", {})
        ),
    )
    if dk.get("oxe_mix"):
        kwargs_list, weights = make_oxe_dataset_kwargs_and_weights(
            dk["oxe_mix"],
            dk["data_dir"],
            load_camera_views=("primary",),
            skip_unlabeled=dk.get("skip_unlabeled", False),
            add_initial_image=config["hypernet_kwargs"].get(
                "use_initial_image", False
            ),
        )
    else:
        kwargs_list = dk["dataset_kwargs_list"]
        weights = dk.get("sample_weights")
    dataset = make_interleaved_dataset(
        kwargs_list,
        weights,
        train=train,
        shuffle_buffer_size=dk.get("shuffle_buffer_size", 1000),
        traj_transform_kwargs=traj_kwargs,
        frame_transform_kwargs=frame_kwargs,
        batch_size=dk["batch_size"],
        balance_weights=dk.get("balance_weights", False),
        seed=config.get("seed", 0),
    )
    return dataset


def train(
    config: Dict[str, Any],
    save_dir: Optional[str] = None,
    num_steps: Optional[int] = None,
    dataset=None,
    wandb_run=None,
    fsdp: int = 1,
    tp: int = 1,
    profile_dir: Optional[str] = None,
    profile_steps: tuple = (10, 15),
) -> TrainState:
    """Runs the training loop; returns the final TrainState."""
    from hypervla_tpu.utils.jax_utils import initialize_compilation_cache

    initialize_compilation_cache()
    num_steps = num_steps if num_steps is not None else config["num_steps"]
    rng = jax.random.PRNGKey(config.get("seed", 0))

    if dataset is None:
        dataset = make_train_datasets(config)
    process_batch = make_process_batch(config)
    data_iter = map(process_batch, iter(dataset.prefetch(2)))

    # example batch primes model construction (T5 embedding dims etc.)
    example_batch = next(data_iter)
    example_batch = _prime_example_batch(example_batch, config)

    # skip DINO attention-map capture when nothing consumes it
    from hypervla_tpu.configs.defaults import (
        disable_unused_attention_capture,
    )

    disable_unused_attention_capture(config)

    text_apply, dino_apply, t5_params, dino_params = build_frozen_encoders(
        config
    )
    # host-side closures (validation callback etc.)
    text_encode = lambda ids, mask: text_apply(t5_params, ids, mask)  # noqa: E731
    dino_encode = (
        (lambda imgs: dino_apply(dino_params, imgs)) if dino_apply else None
    )

    model = HyperVLA.from_config(
        config,
        example_batch,
        rng,
        dataset_statistics=getattr(dataset, "dataset_statistics", None),
    )

    # fine-tuning warm-start from a pretrained EMA checkpoint
    if config.get("pretrained_checkpoint_path"):
        import pickle

        ema_path = (
            f"{config['pretrained_checkpoint_path']}/"
            f"{config['pretrained_checkpoint_step']}/EMA_params.pkl"
        )
        with open(ema_path, "rb") as f:
            ema_params = pickle.load(f)
        model = model.replace(params=ema_params["EMA_0.999"])
        logging.info(f"Warm-started from {ema_path}")
        del ema_params

    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params,
        hn_param_type_tree(model.params),
        **config["optimizer"],
    )
    state = TrainState.create(
        rng, model.params, tx, track_ema=config.get("save_param_EMA", False)
    )

    save_callback = SaveCallback(save_dir)
    val_callback = _build_validation_callback(
        config, model, text_encode, dino_encode, process_batch
    )
    viz_callback = _build_visualization_callback(
        config, model, text_encode, dino_encode
    )
    start_step = 0
    if save_dir is not None:
        state, restored_step = save_callback.restore(state)
        if restored_step is not None:
            start_step = restored_step
            logging.info(f"Resumed from step {start_step}")

    mesh = create_mesh(fsdp=fsdp, tp=tp)
    if fsdp > 1 or tp > 1:
        from hypervla_tpu.parallel.mesh import fsdp_sharding

        state_shardings = fsdp_sharding(mesh, state)
        state = jax.tree_util.tree_map(jax.device_put, state, state_shardings)
    else:
        state = jax.device_put(state, replicated(mesh))
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn,
        text_encode=text_apply, dino_encode=dino_apply, mesh=mesh,
    )
    # frozen encoder weights ride through the step as (replicated) arguments
    encoder_params = jax.device_put(
        {"t5": t5_params, "dino": dino_params}, replicated(mesh)
    )

    def _prepared():
        for raw in data_iter:
            task_index = _drawer_task_index(raw)
            prepared = _prime_example_batch(raw, config, embed=False)
            yield {"batch": prepared, "task_index": task_index or {}}

    from hypervla_tpu.parallel.mesh import device_prefetch

    prefetched = device_prefetch(_prepared(), mesh, size=2)

    timer = Timer()
    last_saved_step = None
    for i in range(start_step, num_steps):
        if profile_dir is not None and i == profile_steps[0]:
            jax.profiler.start_trace(profile_dir)
        if profile_dir is not None and i == profile_steps[1]:
            jax.profiler.stop_trace()
            try:
                import glob

                from hypervla_tpu.utils.xplane import module_time_ms

                pbs = sorted(glob.glob(
                    f"{profile_dir}/**/*.xplane.pb", recursive=True
                ))
                if pbs:
                    for name, (ms, count) in module_time_ms(pbs[-1]).items():
                        logging.info(
                            f"profile: {name}: {ms / max(count, 1):.2f} ms "
                            f"device/step over {count} steps"
                        )
            except Exception as e:
                logging.warning(f"profile summary failed: {e!r}")
        timer.tick("total")
        with timer("dataset"):
            item = next(prefetched)
            batch, task_index = item["batch"], item["task_index"] or None
        step_will_log = (i + 1) % config.get("log_interval", 100) == 0
        with timer("train"):
            state, info = step_fn(
                state, batch, task_index, encoder_params,
                with_metrics=step_will_log,
            )
        timer.tock("total")

        step = i + 1
        if save_dir is not None and step % config.get("save_interval", 10000) == 0:
            save_callback(model, state, step)
            last_saved_step = step
        if (
            val_callback is not None
            and step % config.get("eval_interval", 5000) == 0
        ):
            with timer("eval"):
                val_metrics = val_callback(
                    jax.device_get(state.params), step
                )
            logging.info(f"step {step}: {val_metrics}")
            if wandb_run is not None:
                wandb_run.log(val_metrics, step=step)
        if (
            viz_callback is not None
            and step % config.get("viz_interval",
                                  config.get("eval_interval", 5000)) == 0
        ):
            with timer("visualize"):
                viz_metrics = viz_callback(jax.device_get(state.params), step)
            logging.info(f"step {step}: {viz_metrics}")
            if wandb_run is not None:
                wandb_run.log(viz_metrics, step=step)
        if step % config.get("log_interval", 100) == 0:
            info = jax.device_get(info)
            info["timer"] = timer.get_average_times()
            if wandb_run is not None:
                wandb_run.log(_flatten_log(info), step=step)
            logging.info(
                f"step {step}: loss={float(info['training_loss']):.4f}"
            )
    if save_dir is not None:
        if last_saved_step != num_steps:
            save_callback(model, state, num_steps)
        save_callback.wait()
    return state


def _build_visualization_callback(config, model, text_encode, dino_encode):
    """Offline manipulation-metric visualizers over the datasets named in
    config["viz_datasets"] (parity: octo/utils/train_callbacks.py:266-316)."""
    viz_datasets = config.get("viz_datasets") or ()
    dk = config["dataset_kwargs"]
    kwargs_list = dk.get("dataset_kwargs_list") or []
    selected = [k for k in kwargs_list if k["name"] in set(viz_datasets)]
    if not selected:
        return None
    from hypervla_tpu.data.dataset import make_single_dataset
    from hypervla_tpu.data.text_processing import HFTokenizer
    from hypervla_tpu.eval.visualization import Visualizer
    from hypervla_tpu.train.callbacks import VisualizationCallback

    tokenizer = HFTokenizer(
        tokenizer_name=dk.get("text_tokenizer", "t5-base"),
        tokenizer_kwargs={
            "max_length": dk.get("tokenizer_max_length", 32),
            "padding": "max_length",
            "truncation": True,
            "return_tensors": "np",
        },
    )
    visualizers = {}
    for kwargs in selected:
        try:
            dataset = make_single_dataset(
                kwargs,
                train=False,
                traj_transform_kwargs=dict(
                    window_size=config.get("window_size", 1),
                    action_horizon=config["base_net_kwargs"]["action_horizon"],
                    max_action_dim=config["base_net_kwargs"]["action_dim"],
                ),
                frame_transform_kwargs=dict(
                    resize_size=dk.get("resize_size", {"primary": (224, 224)}),
                ),
            )
        except FileNotFoundError as e:
            logging.warning(f"viz dataset {kwargs['name']}: {e}")
            continue
        visualizers[kwargs["name"]] = Visualizer(
            dataset=dataset.repeat(), text_processor=tokenizer
        )
    if not visualizers:
        return None
    return VisualizationCallback(
        model,
        text_encode,
        visualizers,
        n_trajs=config.get("viz_num_trajs", 4),
        use_initial_image=config["hypernet_kwargs"].get(
            "use_initial_image", False
        ),
        dino_encode=dino_encode,
    )


def _build_validation_callback(config, model, text_encode, dino_encode,
                               process_batch):
    """Builds per-dataset validation iterators for the eval_datasets listed in
    the config (parity: octo/utils/train_callbacks.py:180-263)."""
    eval_datasets = config.get("eval_datasets") or ()
    dk = config["dataset_kwargs"]
    kwargs_list = dk.get("dataset_kwargs_list") or []
    selected = [k for k in kwargs_list if k["name"] in set(eval_datasets)]
    if not selected:
        return None
    from hypervla_tpu.data.dataset import (
        apply_frame_transforms,
        apply_trajectory_transforms,
        make_dataset_from_rlds,
    )

    val_iterators = {}
    for kwargs in selected:
        try:
            dataset, _ = make_dataset_from_rlds(**kwargs, train=False)
        except FileNotFoundError as e:
            logging.warning(f"validation dataset {kwargs['name']}: {e}")
            continue
        dataset = apply_trajectory_transforms(
            dataset.repeat(),
            window_size=config.get("window_size", 1),
            action_horizon=config["base_net_kwargs"]["action_horizon"],
            max_action_dim=config["base_net_kwargs"]["action_dim"],
            train=False,
        ).flatten_frames()
        dataset = apply_frame_transforms(
            dataset,
            resize_size=dk.get("resize_size", {"primary": (224, 224)}),
            train=False,
        ).batch(min(dk.get("batch_size", 64), 16))
        prepared = map(
            lambda b: _prime_example_batch(process_batch(b), config,
                                           embed=False),
            iter(dataset),
        )
        val_iterators[kwargs["name"]] = prepared
    if not val_iterators:
        return None
    return ValidationCallback(
        model,
        text_encode,
        val_iterators,
        use_initial_image=config["hypernet_kwargs"].get(
            "use_initial_image", False
        ),
        dino_encode=dino_encode,
    )


def _prime_example_batch(batch, config, embed=True):
    """embed=True (model construction): fills placeholder token/patch
    embeddings so the example batch carries the model's full input spec.
    embed=False (the training loop / validation feed): DROPS them — the
    jitted train step recomputes both in-graph from input_ids and the
    initial image (train_step.py:262-275), and shipping placeholder zeros
    per step costs real host->device bandwidth (at bs=64 the two zero
    tensors are ~56 MB/step, measured as the dominant per-step transfer
    in scripts/bench_pipeline_train); ValidationCallback likewise
    overwrites both before use (callbacks.py:313-323). Also drops
    host-only fields either way."""
    instr = batch["task"]["language_instruction"]
    if not embed:
        instr.pop("token_embedding", None)
        if isinstance(batch.get("initial_state"), dict):
            batch["initial_state"].pop("patch_embeddings", None)
    else:
        if "token_embedding" not in instr:
            t5_dim = 768
            instr["token_embedding"] = np.zeros(
                (*np.asarray(instr["input_ids"]).shape, t5_dim), np.float32
            )
        if config["hypernet_kwargs"].get("use_initial_image", False):
            if "patch_embeddings" not in batch.get("initial_state", {}):
                from hypervla_tpu.models.encoders.dinov2 import dinov2_config

                name = config["base_net_kwargs"]["vit_kwargs"].get(
                    "pretrained_encoder_name", "dinov2-base"
                )
                dcfg = dinov2_config(name)
                size = config["dataset_kwargs"].get(
                    "resize_size", {"primary": (224, 224)}
                )["primary"]
                patches = (
                    (size[0] // dcfg.patch_size) * (size[1] // dcfg.patch_size)
                )
                batch["initial_state"]["patch_embeddings"] = np.zeros(
                    (
                        batch["action"].shape[0],
                        patches + 1,
                        dcfg.hidden_size,
                    ),
                    np.float32,
                )
    batch["task"].pop("instruction_string", None)
    batch.pop("dataset_name", None)
    return batch


def _drawer_task_index(batch):
    strings = batch["task"].pop("instruction_string", None)
    if strings is None:
        return None
    task_index = {}
    for task_name in DRAWER_TASKS:
        task_index[task_name.decode("utf-8")] = jnp.asarray(
            np.asarray(strings) == task_name, jnp.float32
        )
    return task_index


def _flatten_log(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_log(v, key))
        else:
            out[key] = v
    return out
