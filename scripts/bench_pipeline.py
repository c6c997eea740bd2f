"""Host data-pipeline throughput benchmark.

Measures the threaded pipeline end to end (decode -> traj transforms ->
frame transforms -> shuffle -> batch) in frames/s, without touching the
accelerator. Use --device_augment to measure how much host CPU the fused
on-device augmentation path frees (with it, the host only decodes+resizes).

    python -m scripts.bench_pipeline --data_dir /path/to/rlds \
        --dataset_name bridge_dataset [--synthetic] [--device_augment]

With --synthetic, writes a temporary npz fixture dataset first so the
benchmark runs anywhere.
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--dataset_name", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--device_augment", action="store_true")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_batches", type=int, default=30)
    parser.add_argument("--resize", type=int, default=224)
    args = parser.parse_args()

    from hypervla_tpu.data.dataset import make_interleaved_dataset

    tmp = None
    if args.synthetic or args.data_dir is None:
        tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
        args.dataset_name = write_synthetic(tmp)
        args.data_dir = tmp

    dataset = make_interleaved_dataset(
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
    )
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
        },
    }))


if __name__ == "__main__":
    main()
