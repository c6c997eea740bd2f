"""Pipeline-fed flagship train step: does the host pipeline sustain the
device step rate?

The staged-batch benches (scripts/bench_train.py) measure the device
ceiling with the input batch already resident. This bench closes the loop
the way the trainer actually runs (hypervla_tpu/train/trainer.py:324-366):
a real interleaved OXE-style mix (weighted interleave, statistics,
shuffle, decode+resize on threads) feeds the SAME single-jit GSPMD train
step through `device_prefetch`, and we record

  1. pipeline-only frames/s (the host-side bound on this machine),
  2. staged-batch samples/s (the device ceiling, same session),
  3. pipeline-fed samples/s + per-step dataset-wait fraction.

Reference contract being measured: octo/data/dataset.py:566-674 feeding
scripts/train.py:627-674 — the reference never measures whether its
tf.data pipeline keeps up either; this records the number.

    python -m scripts.bench_pipeline_train --batch 64 --steps 30
"""
import argparse
import io
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def write_random_fixtures(root: str, n: int, traj_len: int = 24,
                          hw: int = 256, episodes_per_ds: int = 6):
    """Fixture mix with RANDOM jpeg frames (realistic decode cost — the
    constant-gray frames in bench_pipeline's mix fixtures compress to ~1 KB
    and decode unrealistically fast)."""
    from PIL import Image

    from hypervla_tpu.data.oxe.fixture_mix import dataset_name
    from hypervla_tpu.data.sources import NpzTrajectorySource

    rng = np.random.RandomState(0)
    for i in range(n):
        ds_dir = os.path.join(root, dataset_name(i))
        os.makedirs(ds_dir, exist_ok=True)
        for ep in range(episodes_per_ds):
            frames = []
            for _ in range(traj_len):
                buf = io.BytesIO()
                Image.fromarray(
                    rng.randint(0, 255, (hw, hw, 3)).astype(np.uint8)
                ).save(buf, format="JPEG")
                frames.append(buf.getvalue())
            traj = {
                "observation": {
                    "image": np.array(frames, dtype=object),
                },
                "action": rng.randn(traj_len, 7).astype(np.float32),
                "language_instruction": np.array(
                    [f"task for dataset {i}".encode()] * traj_len,
                    dtype=object,
                ),
            }
            NpzTrajectorySource.write_trajectory(
                os.path.join(ds_dir, f"ep_{ep:03d}.npz"), traj
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--steps", type=int, default=30,
                    help="timed pipeline-fed optimizer updates")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--staged-steps", type=int, default=20,
                    help="timed staged-batch updates (device ceiling)")
    ap.add_argument("--pipe-batches", type=int, default=12,
                    help="batches for the pipeline-only rate")
    ap.add_argument("--datasets", type=int, default=4)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no-fast", action="store_true",
                    help="skip the fast-training preset")
    ap.add_argument("--verbose", action="store_true",
                    help="per-step wait/dispatch/fetch timing")
    ap.add_argument("--augment", choices=["device", "host", "none"],
                    default="device",
                    help="augmentation placement: fused into the jitted "
                         "step (TPU-first default), on host threads "
                         "(reference semantics), or off")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from hypervla_tpu.configs import tiny_test_config
    from hypervla_tpu.configs.defaults import (
        disable_unused_attention_capture,
        flagship_pretrain_config,
    )
    from hypervla_tpu.data.oxe.fixture_mix import register_fixture_mix
    from hypervla_tpu.models.hypervla import HyperVLA
    from hypervla_tpu.parallel.mesh import (
        create_mesh,
        device_prefetch,
        replicated,
        shard_batch,
    )
    from hypervla_tpu.train.optimizer import (
        create_optimizer,
        hn_param_type_tree,
    )
    from hypervla_tpu.train.train_state import TrainState
    from hypervla_tpu.train.train_step import make_train_step
    from hypervla_tpu.train.trainer import (
        _drawer_task_index,
        _prime_example_batch,
        build_frozen_encoders,
        make_process_batch,
        make_train_datasets,
    )
    from hypervla_tpu.utils.jax_utils import initialize_compilation_cache

    initialize_compilation_cache()

    root = tempfile.mkdtemp(prefix="bench_pipe_train_")
    t0 = time.perf_counter()
    write_random_fixtures(root, args.datasets,
                          hw=64 if args.tiny else 256)
    mix_name, _ = register_fixture_mix(args.datasets)
    print(f"fixtures written in {time.perf_counter() - t0:.1f}s", flush=True)

    if args.tiny:
        config = tiny_test_config(encoder_type="DINOv2")
    else:
        config = flagship_pretrain_config()
    resize = (224, 224)  # the DINOv2 trunks (tiny twin included) pin 224
    disable_unused_attention_capture(config)
    if not args.no_fast and not args.tiny:
        from hypervla_tpu.configs import apply_fast_training_preset

        apply_fast_training_preset(config)
    augment_kwargs = {
        "random_resized_crop": {"scale": [0.8, 1.0], "ratio": [0.9, 1.1]},
        "random_brightness": [0.2],
        "random_contrast": [0.8, 1.2],
        "random_saturation": [0.8, 1.2],
        "random_hue": [0.05],
        "augment_order": [
            "random_resized_crop", "random_brightness", "random_contrast",
            "random_saturation", "random_hue",
        ],
    }
    config["dataset_kwargs"] = {
        "batch_size": args.batch,
        "shuffle_buffer_size": 500,
        "oxe_mix": mix_name,
        "data_dir": root,
        "balance_weights": True,
        "text_tokenizer": "t5-base",
        "tokenizer_max_length": 32,
        "resize_size": {"primary": resize},
        "device_augment": args.augment == "device",
        "image_augment_kwargs": (
            {} if args.augment == "none" else augment_kwargs
        ),
    }
    config["optimizer"]["grad_accumulation_steps"] = args.accum

    t0 = time.perf_counter()
    dataset = make_train_datasets(config)
    process_batch = make_process_batch(config)
    data_iter = map(process_batch, iter(dataset.prefetch(2)))
    build_s = time.perf_counter() - t0

    # --- 1. pipeline-only rate (host bound) ---
    next(data_iter)  # fill buffers
    t0 = time.perf_counter()
    for _ in range(args.pipe_batches):
        example_batch = next(data_iter)
    pipe_dt = time.perf_counter() - t0
    pipe_fps = args.pipe_batches * args.batch / pipe_dt
    print(f"pipeline-only: {pipe_fps:.1f} frames/s "
          f"(build {build_s:.1f}s)", flush=True)

    # --- model + step, exactly the trainer's construction path ---
    import copy

    rng = jax.random.PRNGKey(config.get("seed", 0))
    # deep copies: _prime_example_batch/_drawer_task_index mutate nested
    # dicts, so a shallow dict() copy would couple the model-construction
    # batch with the staged-batch section below (ADVICE r4)
    raw_example_batch = copy.deepcopy(example_batch)
    example_batch = _prime_example_batch(copy.deepcopy(example_batch), config)
    model = HyperVLA.from_config(
        config, example_batch, rng,
        dataset_statistics=getattr(dataset, "dataset_statistics", None),
    )
    config = model.config
    text_apply, dino_apply, t5_params, dino_params = build_frozen_encoders(
        config
    )
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    state = TrainState.create(
        rng, model.params, tx, track_ema=config.get("save_param_EMA", True)
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

    def prepare(raw):
        task_index = _drawer_task_index(raw) or {}
        return _prime_example_batch(raw, config, embed=False), task_index

    # --- 2. staged-batch ceiling (same session, same program) ---
    staged_batch, staged_ti = prepare(copy.deepcopy(raw_example_batch))
    staged_batch = shard_batch(staged_batch, mesh)
    print(f"compiling (bs={args.batch}, accum={args.accum}) ...", flush=True)
    t0 = time.perf_counter()
    for _ in range(max(1, args.warmup)):
        for _ in range(args.accum):
            state, info = step_fn(
                state, staged_batch, staged_ti, encoder_params,
                with_metrics=False,
            )
    jax.block_until_ready(info)
    print(f"warmup done in {time.perf_counter() - t0:.1f}s, "
          f"loss={float(info['training_loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.staged_steps):
        for _ in range(args.accum):
            state, info = step_fn(
                state, staged_batch, staged_ti, encoder_params,
                with_metrics=False,
            )
    jax.block_until_ready(info)
    staged_dt = time.perf_counter() - t0
    staged_sps = args.staged_steps * args.batch * args.accum / staged_dt
    print(f"staged-batch: {staged_sps:.1f} samples/s", flush=True)

    # --- 3. pipeline-fed loop (trainer semantics: prefetch depth 2) ---
    def _prepared():
        for raw in data_iter:
            batch, task_index = prepare(raw)
            yield {"batch": batch, "task_index": task_index}

    # one FRESH batch per micro-step: grad accumulation is optax.MultiSteps,
    # so the real trainer consumes a new batch per step_fn call — replaying
    # one fetched batch across the accum inner loop would understate the
    # host-pipeline load by accum x (ADVICE r4)
    prefetched = device_prefetch(_prepared(), mesh, size=2)
    for _ in range(args.warmup):
        for _ in range(args.accum):
            item = next(prefetched)
            state, info = step_fn(
                state, item["batch"], item["task_index"], encoder_params,
                with_metrics=False,
            )
    jax.block_until_ready(info)

    wait_s = 0.0
    t0 = time.perf_counter()
    for i in range(args.steps):
        t_wait = 0.0
        td0 = time.perf_counter()
        for _ in range(args.accum):
            tw = time.perf_counter()
            item = next(prefetched)
            t_wait += time.perf_counter() - tw
            state, info = step_fn(
                state, item["batch"], item["task_index"], encoder_params,
                with_metrics=False,
            )
        wait_s += t_wait
        t_disp = time.perf_counter() - td0 - t_wait
        if args.verbose:
            # verbose serializes: fetch a scalar to attribute per-step time
            # (wait vs dispatch vs device completion). The headline run does
            # NOT fetch per step — the trainer only fetches on log steps, so
            # batch (i+1)'s transfer overlaps step i's compute.
            tf_ = time.perf_counter()
            float(info["training_loss"])
            t_fetch = time.perf_counter() - tf_
            print(f"step {i}: wait {t_wait * 1e3:.0f} ms, dispatch "
                  f"{t_disp * 1e3:.0f} ms, fetch {t_fetch * 1e3:.0f} ms",
                  flush=True)
    jax.block_until_ready(info)
    fed_dt = time.perf_counter() - t0
    fed_sps = args.steps * args.batch * args.accum / fed_dt
    print(f"pipeline-fed: {fed_sps:.1f} samples/s "
          f"(dataset-wait {wait_s / fed_dt * 100:.0f}%)", flush=True)

    print(json.dumps({
        "metric": "pipeline-fed flagship train step",
        "value": round(fed_sps, 1),
        "unit": "samples/s",
        "aux": {
            "batch": args.batch,
            "accum": args.accum,
            "augment": args.augment,
            "fast_preset": not args.no_fast,
            "datasets": args.datasets,
            "host_cores": os.cpu_count(),
            "pipeline_only_frames_per_s": round(pipe_fps, 1),
            "staged_samples_per_s": round(staged_sps, 1),
            "fed_over_staged": round(fed_sps / staged_sps, 3),
            "dataset_wait_frac": round(wait_s / fed_dt, 3),
            "loss": float(info["training_loss"]),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
