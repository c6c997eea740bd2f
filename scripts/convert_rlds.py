"""Converts TFDS/RLDS datasets into the native .npz trajectory shard format.

The native format (one compressed .npz per trajectory, nested keys flattened
with '/', encoded images kept as bytes) is what the TPU input pipeline reads
fastest; RLDS tfrecords also work directly via data/sources.RldsTfrecordSource,
but conversion pays off for repeated epochs.

Usage:
    python -m scripts.convert_rlds --src <tfds_dir>/<name>/<version> \
        --dst <out_dir>/<name> [--max_episodes N]
"""
import argparse
import os


def convert(src: str, dst: str, max_episodes=None, validate_crc=False):
    from hypervla_tpu.data.sources import NpzTrajectorySource, RldsTfrecordSource

    os.makedirs(dst, exist_ok=True)
    source = RldsTfrecordSource(src)
    count = 0
    for traj in source.trajectories(shuffle=False):
        NpzTrajectorySource.write_trajectory(
            os.path.join(dst, f"episode_{count:06d}.npz"), traj
        )
        count += 1
        if count % 100 == 0:
            print(f"converted {count} episodes")
        if max_episodes is not None and count >= max_episodes:
            break
    print(f"done: {count} episodes -> {dst}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="TFDS dataset version dir")
    parser.add_argument("--dst", required=True, help="output npz directory")
    parser.add_argument("--max_episodes", type=int, default=None)
    args = parser.parse_args()
    convert(args.src, args.dst, args.max_episodes)
