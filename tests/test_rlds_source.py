"""RldsTfrecordSource test: a synthetic TFDS-style RLDS dataset (features.json
+ tfrecord shards written by our codec) read back into trajectories and fed
through make_dataset_from_rlds."""
import json
import os

import numpy as np
import pytest

from hypervla_tpu.data.dataset import make_dataset_from_rlds
from hypervla_tpu.data.sources import RldsTfrecordSource
from hypervla_tpu.data.tfrecord import encode_example, write_tfrecord


def _features_json():
    """Minimal TFDS features.json for an RLDS episode structure."""
    tensor = lambda dims, dtype: {
        "tensor": {
            "shape": {"dimensions": [str(d) for d in dims]},
            "dtype": dtype,
        }
    }
    return {
        "featuresDict": {
            "features": {
                "steps": {
                    "sequence": {
                        "feature": {
                            "featuresDict": {
                                "features": {
                                    "observation": {
                                        "featuresDict": {
                                            "features": {
                                                "image": {"image": {}},
                                                "state": tensor([8], "float32"),
                                            }
                                        }
                                    },
                                    "action": tensor([7], "float32"),
                                    "language_instruction": {"text": {}},
                                    "is_last": tensor([], "bool"),
                                }
                            }
                        }
                    }
                },
                "episode_id": tensor([], "int64"),
            }
        }
    }


@pytest.fixture(scope="module")
def rlds_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rlds") / "synthetic_rlds" / "1.0.0"
    os.makedirs(root)
    with open(root / "features.json", "w") as f:
        json.dump(_features_json(), f)

    rng = np.random.RandomState(0)
    records = []
    for ep in range(4):
        n = 6
        features = {
            "steps/observation/image": [
                _jpeg(rng.randint(0, 255, (32, 32, 3)).astype(np.uint8))
                for _ in range(n)
            ],
            "steps/observation/state": rng.randn(n, 8).astype(
                np.float32
            ).reshape(-1),
            "steps/action": rng.randn(n, 7).astype(np.float32).reshape(-1),
            "steps/language_instruction": [b"stack the blocks"] * n,
            "steps/is_last": np.array([0] * (n - 1) + [1], np.int64),
            "episode_id": np.array([ep], np.int64),
        }
        records.append(encode_example(features))
    write_tfrecord(
        str(root / "synthetic_rlds-train.tfrecord-00000-of-00001"), records
    )
    return str(root)


def _jpeg(arr):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def test_rlds_source_decodes_episode(rlds_dir):
    source = RldsTfrecordSource(rlds_dir)
    trajs = list(source.trajectories())
    assert len(trajs) == 4
    traj = trajs[0]
    assert traj["action"].shape == (6, 7)
    assert traj["observation"]["state"].shape == (6, 8)
    assert len(traj["observation"]["image"]) == 6
    assert traj["language_instruction"][0] == b"stack the blocks"
    assert int(np.asarray(traj["episode_id"]).reshape(-1)[0]) == 0


def test_make_dataset_from_rlds_over_tfrecords(rlds_dir):
    data_dir = os.path.dirname(os.path.dirname(rlds_dir))
    dataset, stats = make_dataset_from_rlds(
        name="synthetic_rlds",
        data_dir=data_dir,
        train=True,
        image_obs_keys={"primary": "image"},
        proprio_obs_key="state",
        language_key="language_instruction",
        action_proprio_normalization_type="normal",
        seed=0,
    )
    traj = next(iter(dataset))
    assert "image_primary" in traj["observation"]
    assert traj["observation"]["proprio"].shape[-1] == 8
    assert stats["action"]["mean"] is not None
