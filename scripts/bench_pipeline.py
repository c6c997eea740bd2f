"""Host data-pipeline throughput benchmark.

Measures the threaded pipeline end to end (decode -> traj transforms ->
frame transforms -> shuffle -> batch) in frames/s, without touching the
accelerator. Use --device_augment to measure how much host CPU the fused
on-device augmentation path frees (with it, the host only decodes+resizes).

    python -m scripts.bench_pipeline --data_dir /path/to/rlds \
        --dataset_name bridge_dataset [--synthetic] [--device_augment]

With --synthetic, writes a temporary npz fixture dataset first so the
benchmark runs anywhere. With --tfrecord --gb G, writes G gigabytes of
RLDS TFRecord shards instead and drives the full shard path: native C++
record reader -> features.json decode -> statistics compute + sha256
cache (timed cold and warm) -> interleave/transform/shuffle/batch, with
--read_threads/--transform_threads sweeps.
"""
import argparse
import io
import json
import os
import tempfile
import time

import numpy as np

AUGMENT_KWARGS = {
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


def write_synthetic(root: str, episodes: int = 16, traj_len: int = 32,
                    hw: int = 256):
    from PIL import Image

    from hypervla_tpu.data.sources import NpzTrajectorySource

    rng = np.random.RandomState(0)
    ds_dir = os.path.join(root, "synthetic")
    os.makedirs(ds_dir, exist_ok=True)

    def jpeg(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        return buf.getvalue()

    for ep in range(episodes):
        traj = {
            "observation": {
                "image": np.array(
                    [
                        jpeg(rng.randint(0, 255, (hw, hw, 3)).astype(np.uint8))
                        for _ in range(traj_len)
                    ],
                    dtype=object,
                ),
            },
            "action": rng.randn(traj_len, 7).astype(np.float32),
            "language_instruction": np.array(
                [b"pick up the block"] * traj_len, dtype=object
            ),
        }
        NpzTrajectorySource.write_trajectory(
            os.path.join(ds_dir, f"ep_{ep:03d}.npz"), traj
        )
    return "synthetic"


def write_tfrecord_shards(root: str, target_gb: float, shards: int = 8,
                          traj_len: int = 40, hw: int = 256):
    """Writes RLDS-layout TFRecord shards totalling ~target_gb."""
    import json as _json

    from PIL import Image

    from hypervla_tpu.data.tfrecord import encode_example, write_tfrecord

    name = "synthetic_tfrec"
    ds_dir = os.path.join(root, name, "1.0.0")
    os.makedirs(ds_dir, exist_ok=True)
    tensor = lambda dims, dtype: {"tensor": {  # noqa: E731
        "shape": {"dimensions": [str(d) for d in dims]}, "dtype": dtype,
    }}
    features = {
        "featuresDict": {"features": {
            "steps": {"sequence": {"feature": {"featuresDict": {"features": {
                "observation": {"featuresDict": {"features": {
                    "image": {"image": {}},
                }}},
                "action": tensor([7], "float32"),
                "language_instruction": {"text": {}},
                "is_last": tensor([], "int64"),
            }}}}},
            "episode_id": tensor([], "int64"),
        }}
    }
    with open(os.path.join(ds_dir, "features.json"), "w") as f:
        _json.dump(features, f)

    rng = np.random.RandomState(0)

    def jpeg(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    # one noisy frame reused with per-episode perturbation: keeps generation
    # fast while every record still decodes real jpeg bytes
    base = rng.randint(0, 255, (hw, hw, 3)).astype(np.uint8)
    frame_bytes = jpeg(base)
    per_record = len(frame_bytes) * traj_len
    total = 0
    target = target_gb * (1 << 30)
    ep = 0
    for shard in range(shards):
        records = []
        while total < target * (shard + 1) / shards:
            feats = {
                "steps/observation/image": [frame_bytes] * traj_len,
                "steps/action": rng.randn(traj_len, 7).astype(
                    np.float32).reshape(-1),
                "steps/language_instruction": [b"move the widget"] * traj_len,
                "steps/is_last": np.array(
                    [0] * (traj_len - 1) + [1], np.int64),
                "episode_id": np.array([ep], np.int64),
            }
            records.append(encode_example(feats))
            total += per_record
            ep += 1
        write_tfrecord(
            os.path.join(
                ds_dir,
                f"{name}-train.tfrecord-{shard:05d}-of-{shards:05d}",
            ),
            records,
        )
    print(f"wrote {ep} episodes / {total / (1 << 30):.2f} GiB "
          f"in {shards} shards")
    return name


def write_mix_fixtures(root: str, n: int, traj_len: int = 24, hw: int = 256):
    """Writes n fixture datasets with distinct sizes and gray levels.

    The per-dataset gray level lets the benchmark attribute each interleaved
    frame back to its source dataset and check the empirical mix
    distribution against the expected weights."""
    from PIL import Image

    from hypervla_tpu.data.oxe.fixture_mix import dataset_name
    from hypervla_tpu.data.sources import NpzTrajectorySource

    rng = np.random.RandomState(0)
    gray_levels = [int(round(20 + 215 * i / max(n - 1, 1))) for i in range(n)]
    sizes = []
    for i in range(n):
        ds_dir = os.path.join(root, dataset_name(i))
        os.makedirs(ds_dir, exist_ok=True)
        frame = np.full((hw, hw, 3), gray_levels[i], np.uint8)
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG")
        frame_bytes = buf.getvalue()
        episodes = 4 + 2 * (i % 3)  # distinct sizes exercise balance_weights
        for ep in range(episodes):
            traj = {
                "observation": {
                    "image": np.array([frame_bytes] * traj_len, dtype=object),
                },
                "action": (rng.randn(traj_len, 7) * (i + 1)).astype(
                    np.float32
                ),
                "language_instruction": np.array(
                    [f"task for dataset {i}".encode()] * traj_len,
                    dtype=object,
                ),
            }
            NpzTrajectorySource.write_trajectory(
                os.path.join(ds_dir, f"ep_{ep:03d}.npz"), traj
            )
        sizes.append(episodes * traj_len)
    return gray_levels, sizes


def run_mix(args):
    """The named-mix path end to end: registry expansion -> weights +
    balance -> per-dataset statistics -> weighted interleave [-> trainer]."""
    from hypervla_tpu.data.dataset import make_interleaved_dataset
    from hypervla_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
    from hypervla_tpu.data.oxe.fixture_mix import register_fixture_mix

    root = args.data_dir or tempfile.mkdtemp(prefix="bench_mix_")
    n = args.mix
    gray_levels, sizes = write_mix_fixtures(root, n)
    mix_name, weights = register_fixture_mix(n)

    kwargs_list, weights = make_oxe_dataset_kwargs_and_weights(
        mix_name, root, load_camera_views=("primary",)
    )
    t0 = time.perf_counter()
    dataset = make_interleaved_dataset(
        kwargs_list,
        weights,
        train=True,
        shuffle_buffer_size=500,
        balance_weights=True,
        traj_transform_kwargs=dict(window_size=1, action_horizon=4,
                                   max_action_dim=7),
        frame_transform_kwargs=dict(
            resize_size={"primary": (args.resize, args.resize)}
        ),
        batch_size=args.batch_size,
        seed=0,
    )
    build_s = time.perf_counter() - t0

    expected = np.array(weights, np.float64) * np.array(sizes, np.float64)
    expected /= expected.sum()

    it = iter(dataset)
    next(it)
    levels = np.array(gray_levels, np.float64)
    counts = np.zeros(n)
    t0 = time.perf_counter()
    frames = 0
    for _ in range(args.num_batches):
        batch = next(it)
        frames += batch["action"].shape[0]
        means = batch["observation"]["image_primary"].reshape(
            batch["action"].shape[0], -1
        ).mean(axis=1)
        idx = np.argmin(np.abs(means[:, None] - levels[None, :]), axis=1)
        np.add.at(counts, idx, 1)
    dt = time.perf_counter() - t0
    observed = counts / counts.sum()

    result = {
        "metric": "OXE named-mix pipeline throughput",
        "value": round(frames / dt, 1),
        "unit": "frames/s",
        "aux": {
            "mix": mix_name,
            "datasets": n,
            "build_s": round(build_s, 2),
            "expected_mix": [round(float(x), 3) for x in expected],
            "observed_mix": [round(float(x), 3) for x in observed],
            "batch_size": args.batch_size,
        },
    }

    if args.train_steps:
        from hypervla_tpu.configs import tiny_test_config
        from hypervla_tpu.train.trainer import train

        config = tiny_test_config(encoder_type="SmallStem")
        config["dataset_kwargs"] = {
            "batch_size": args.batch_size,
            "shuffle_buffer_size": 100,
            "tokenizer_max_length": 8,
            "oxe_mix": mix_name,
            "data_dir": root,
            "balance_weights": True,
            "resize_size": {"primary": (64, 64)},
        }
        t0 = time.perf_counter()
        state = train(config, save_dir=None, num_steps=args.train_steps)
        train_s = time.perf_counter() - t0
        assert int(state.step) == args.train_steps
        result["aux"]["train_steps"] = args.train_steps
        result["aux"]["train_samples_per_s"] = round(
            args.train_steps * args.batch_size / train_s, 1
        )
    print(json.dumps(result))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--dataset_name", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--device_augment", action="store_true")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_batches", type=int, default=30)
    parser.add_argument("--resize", type=int, default=224)
    parser.add_argument("--tfrecord", action="store_true",
                        help="drive RLDS TFRecord shards (C++ reader path)")
    parser.add_argument("--gb", type=float, default=1.0,
                        help="total TFRecord volume to generate")
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--read_threads", type=int, default=None)
    parser.add_argument("--transform_threads", type=int, default=None)
    parser.add_argument("--mix", type=int, default=0, metavar="N",
                        help="run the OXE named-mix path over N fixture "
                             "datasets (weights+balance+stats+interleave)")
    parser.add_argument("--train_steps", type=int, default=0,
                        help="with --mix: also feed the trainer this many "
                             "steps from the mix (one end-to-end program)")
    args = parser.parse_args()

    if args.mix:
        return run_mix(args)

    from hypervla_tpu.data.dataset import make_interleaved_dataset

    tmp = None
    if args.tfrecord:
        tmp = args.data_dir or tempfile.mkdtemp(prefix="bench_tfrec_")
        gen_t0 = time.perf_counter()
        args.dataset_name = write_tfrecord_shards(
            tmp, args.gb, shards=args.shards
        )
        print(f"generation took {time.perf_counter() - gen_t0:.1f}s")
        args.data_dir = tmp
    elif args.synthetic or args.data_dir is None:
        tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
        args.dataset_name = write_synthetic(tmp)
        args.data_dir = tmp

    def build():
        stats_t0 = time.perf_counter()
        ds = make_interleaved_dataset(
            [
                dict(
                    name=args.dataset_name,
                    data_dir=args.data_dir,
                    image_obs_keys={"primary": "image"},
                    language_key="language_instruction",
                    action_proprio_normalization_type="normal",
                )
            ],
            None,
            train=True,
            shuffle_buffer_size=500,
            traj_transform_kwargs=dict(window_size=1, action_horizon=4,
                                       max_action_dim=7),
            frame_transform_kwargs=dict(
                resize_size={"primary": (args.resize, args.resize)},
                image_augment_kwargs=(
                    {} if args.device_augment else {"primary": AUGMENT_KWARGS}
                ),
            ),
            batch_size=args.batch_size,
            traj_transform_threads=args.transform_threads,
            traj_read_threads=args.read_threads,
        )
        return ds, time.perf_counter() - stats_t0

    # cold build computes + caches statistics; warm build must hit the cache
    dataset, stats_cold_s = build()
    if args.tfrecord:
        _, stats_warm_s = build()
        print(json.dumps({
            "statistics_pass_cold_s": round(stats_cold_s, 2),
            "statistics_pass_warm_s": round(stats_warm_s, 2),
        }))
    it = iter(dataset)
    next(it)  # warm the pipeline threads
    t0 = time.perf_counter()
    frames = 0
    for _ in range(args.num_batches):
        batch = next(it)
        frames += batch["action"].shape[0]
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "host pipeline throughput",
        "value": round(frames / dt, 1),
        "unit": "frames/s",
        "aux": {
            "batch_size": args.batch_size,
            "device_augment": args.device_augment,
            "resize": args.resize,
            "seconds": round(dt, 2),
            "tfrecord": args.tfrecord,
            "read_threads": args.read_threads,
            "transform_threads": args.transform_threads,
        },
    }))


if __name__ == "__main__":
    main()
