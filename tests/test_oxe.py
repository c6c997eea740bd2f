"""OXE registry + standardization transform tests."""
import numpy as np
import pytest

from hypervla_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
from hypervla_tpu.data.oxe.oxe_dataset_configs import OXE_DATASET_CONFIGS
from hypervla_tpu.data.oxe.oxe_dataset_mixes import OXE_NAMED_MIXES
from hypervla_tpu.data.oxe.oxe_standardization_transforms import (
    OXE_STANDARDIZATION_TRANSFORMS,
    bridge_dataset_transform,
    metaworld_dataset_transform,
    rt1_dataset_transform,
)


def test_registry_covers_all_configs():
    missing = set(OXE_DATASET_CONFIGS) - set(OXE_STANDARDIZATION_TRANSFORMS)
    assert not missing, f"configs without standardize_fn: {missing}"


def test_mixes_reference_known_datasets():
    for mix_name, mix in OXE_NAMED_MIXES.items():
        for name, weight in mix:
            assert name in OXE_DATASET_CONFIGS, f"{mix_name}: unknown {name}"
            assert weight > 0


def test_make_oxe_kwargs_and_weights():
    kwargs_list, weights = make_oxe_dataset_kwargs_and_weights(
        "oxe_magic_soup", "/data", skip_unlabeled=True, add_initial_image=True
    )
    names = [k["name"] for k in kwargs_list]
    # unlabeled datasets are dropped
    assert "kuka" not in names and "viola" not in names
    assert "bridge_dataset" in names and "fractal20220817_data" in names
    assert len(kwargs_list) == len(weights)
    bridge = kwargs_list[names.index("bridge_dataset")]
    assert bridge["image_obs_keys"] == {"primary": "image_0"}
    assert bridge["action_normalization_mask"] == [True] * 6 + [False]
    assert bridge["language_key"] == "language_instruction"
    assert bridge["add_initial_image"] is True
    assert bridge["standardize_fn"]["name"] == "bridge_dataset_transform"


def test_rt1_transform():
    n = 5
    traj = {
        "action": {
            "world_vector": np.ones((n, 3), np.float32),
            "rotation_delta": np.zeros((n, 3), np.float32),
            "gripper_closedness_action": np.array(
                [[0.0], [1.0], [0.0], [-1.0], [0.0]], np.float32
            ),
        },
        "observation": {
            "base_pose_tool_reached": np.zeros((n, 7), np.float32),
            "gripper_closed": np.zeros((n, 1), np.float32),
            "natural_language_instruction": np.array(
                [b"pick thing"] * n, dtype=object
            ),
        },
    }
    out = rt1_dataset_transform(traj)
    assert out["action"].shape == (n, 7)
    # rel(+1 close @1, -1 open @3) -> abs: open until close at 1, open at 3
    np.testing.assert_array_equal(out["action"][:, -1], [1, 0, 0, 1, 1])
    assert out["observation"]["proprio"].shape == (n, 8)
    assert out["language_instruction"][0] == b"pick thing"


def test_bridge_transform_binarizes_and_relabels():
    n = 4
    traj = {
        "action": np.concatenate(
            [
                np.ones((n, 6), np.float32),
                np.array([[1.0], [0.5], [0.02], [0.01]], np.float32),
            ],
            axis=1,
        ),
        "observation": {
            "state": np.arange(n * 7, dtype=np.float32).reshape(n, 7),
        },
    }
    out = bridge_dataset_transform(traj)
    # relabel drops the last step
    assert out["action"].shape == (n - 1, 7)
    # intermediate 0.5 resolves to the next definite state (closed)
    np.testing.assert_array_equal(out["action"][:, -1], [1, 0, 0])
    # movement dims are state deltas
    np.testing.assert_allclose(out["action"][:, :6], 7.0)


def test_metaworld_transform_flips_gripper():
    traj = {
        "action": np.array(
            [[0.1, 0.2, 0.3, 0.0], [0.1, 0.2, 0.3, 1.0]], np.float32
        )
    }
    out = metaworld_dataset_transform(traj)
    np.testing.assert_array_equal(out["action"][:, -1], [1.0, 0.0])
    assert out["action"].shape == (2, 4)
