"""MetaWorld demo converter (parity: data/rlds_converter/meta_world_dataset/
meta_world_dataset_dataset_builder.py).

The reference builds a TFDS GeneratorBasedBuilder from pickled MetaWorld
demonstrations; this converter writes the same episodes straight into the
native .npz shard format (JPEG-encoded frames, float32 states/actions,
per-step language instruction), skipping TFDS entirely.

Expected input: a directory of .pkl files, each holding a list of episode
dicts with keys {"observations" or "images", "states", "actions", "language"}.
"""
import glob
import io
import os
import pickle

import numpy as np


def _encode_jpeg(frame: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame.astype(np.uint8)).save(buf, format="JPEG",
                                                 quality=95)
    return buf.getvalue()


def convert_episode(episode: dict) -> dict:
    frames = episode.get("images", episode.get("observations"))
    frames = np.asarray(frames)
    n = len(frames)
    images = np.array([_encode_jpeg(f) for f in frames], dtype=object)
    language = episode.get("language", episode.get("language_instruction", ""))
    if isinstance(language, (str, bytes)):
        language = [language] * n
    language = np.array(
        [
            s.encode("utf-8") if isinstance(s, str) else bytes(s)
            for s in language
        ],
        dtype=object,
    )
    traj = {
        "observation": {
            "image": images,
        },
        "action": np.asarray(episode["actions"], np.float32),
        "language_instruction": language,
    }
    if "states" in episode:
        traj["observation"]["state"] = np.asarray(episode["states"],
                                                  np.float32)
    return traj


def convert_directory(src_dir: str, dst_dir: str, max_episodes=None) -> int:
    from hypervla_tpu.data.sources import NpzTrajectorySource

    os.makedirs(dst_dir, exist_ok=True)
    count = 0
    for pkl_path in sorted(glob.glob(os.path.join(src_dir, "*.pkl"))):
        with open(pkl_path, "rb") as f:
            episodes = pickle.load(f)
        if isinstance(episodes, dict):
            episodes = [episodes]
        for episode in episodes:
            traj = convert_episode(episode)
            NpzTrajectorySource.write_trajectory(
                os.path.join(dst_dir, f"episode_{count:06d}.npz"), traj
            )
            count += 1
            if max_episodes is not None and count >= max_episodes:
                return count
    return count


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--max_episodes", type=int, default=None)
    args = parser.parse_args()
    n = convert_directory(args.src, args.dst, args.max_episodes)
    print(f"converted {n} episodes")
