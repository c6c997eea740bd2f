"""Unit tests for data utilities, trajectory transforms, and the tfrecord codec."""
import numpy as np
import pytest

from hypervla_tpu.data.data_utils import (
    NormalizationType,
    allocate_threads,
    binarize_gripper_actions,
    combine_dataset_statistics,
    invert_gripper_actions,
    normalize_action_and_proprio,
    rel2abs_gripper_actions,
    relabel_actions,
)
from hypervla_tpu.data.tfrecord import (
    encode_example,
    parse_example,
    read_tfrecord,
    write_tfrecord,
)
from hypervla_tpu.data.traj_transforms import (
    add_pad_mask_dict,
    chunk_act_obs,
    pad_actions_and_proprio,
)


def test_binarize_gripper_actions():
    # open(1.0) ... intermediate ... closed(0.0): intermediates take the
    # NEXT definite state
    actions = np.array([1.0, 0.98, 0.7, 0.4, 0.02, 0.01])
    out = binarize_gripper_actions(actions)
    np.testing.assert_array_equal(out, [1, 1, 0, 0, 0, 0])
    # trailing intermediates keep the raw final action
    actions = np.array([1.0, 0.5, 0.6])
    out = binarize_gripper_actions(actions)
    np.testing.assert_allclose(out, [1.0, 0.6, 0.6])


def test_rel2abs_gripper_actions():
    # relative: +1 close, -1 open -> absolute: 0 closed, 1 open
    rel = np.array([0.0, 0.0, 1.0, 0.0, -1.0, 0.0])
    out = rel2abs_gripper_actions(rel)
    # starts open (first change is closing), closes at idx 2, opens at 4
    np.testing.assert_array_equal(out, [1, 1, 0, 0, 1, 1])


def test_invert_gripper():
    np.testing.assert_array_equal(
        invert_gripper_actions(np.array([0.0, 1.0])), [1.0, 0.0]
    )


def test_relabel_actions():
    traj = {
        "observation": {
            "state": np.arange(24, dtype=np.float32).reshape(3, 8)
        },
        "action": np.ones((3, 7), dtype=np.float32),
    }
    out = relabel_actions(traj)
    assert out["action"].shape == (2, 7)
    np.testing.assert_allclose(out["action"][:, :6], 8.0)  # state deltas
    np.testing.assert_allclose(out["action"][:, -1], 1.0)  # gripper kept


def test_normalize_normal_and_bounds():
    traj = {
        "action": np.array([[0.0, 10.0], [2.0, 20.0]], dtype=np.float32),
        "observation": {},
    }
    stats = {
        "action": {
            "mean": [1.0, 15.0],
            "std": [1.0, 5.0],
            "p01": [0.0, 10.0],
            "p99": [2.0, 20.0],
            "mask": [True, False],
        }
    }
    out = normalize_action_and_proprio(
        dict(traj), stats, NormalizationType.NORMAL
    )
    np.testing.assert_allclose(out["action"][:, 0], [-1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(out["action"][:, 1], [10.0, 20.0])  # masked off
    out = normalize_action_and_proprio(
        dict(traj), stats, NormalizationType.BOUNDS
    )
    np.testing.assert_allclose(out["action"][:, 0], [-1.0, 1.0], atol=1e-4)


def test_chunk_act_obs_shapes_and_masks():
    traj_len, adim = 5, 3
    traj = {
        "observation": {"image_primary": np.arange(traj_len)[:, None]},
        "task": {},
        "action": np.arange(traj_len * adim, dtype=np.float32).reshape(
            traj_len, adim
        ),
        "action_pad_mask": np.ones((traj_len, adim), dtype=bool),
    }
    out = chunk_act_obs(traj, window_size=2, action_horizon=3)
    assert out["observation"]["image_primary"].shape == (traj_len, 2, 1)
    assert out["action"].shape == (traj_len, 2, 3, adim)
    # first timestep history is padding
    assert not out["observation"]["timestep_pad_mask"][0, 0]
    assert out["observation"]["timestep_pad_mask"][0, 1]
    # action chunks repeat the final action at the end
    np.testing.assert_array_equal(
        out["action"][-1, -1, 0], out["action"][-1, -1, 2]
    )


def test_add_pad_mask_dict_strings():
    traj = {
        "observation": {
            "image_primary": np.array([b"img", b""], dtype=object),
        },
        "task": {"language_instruction": np.array([b"do it", b"do it"],
                                                  dtype=object)},
        "action": np.zeros((2, 3), dtype=np.float32),
    }
    out = add_pad_mask_dict(traj)
    np.testing.assert_array_equal(
        out["observation"]["pad_mask_dict"]["image_primary"], [True, False]
    )
    np.testing.assert_array_equal(
        out["task"]["pad_mask_dict"]["language_instruction"], [True, True]
    )


def test_pad_actions_and_proprio():
    traj = {
        "action": np.ones((4, 5), dtype=np.float32),
        "observation": {"proprio": np.ones((4, 3), dtype=np.float32)},
    }
    out = pad_actions_and_proprio(traj, max_action_dim=7, max_proprio_dim=6)
    assert out["action"].shape == (4, 7)
    assert out["observation"]["proprio"].shape == (4, 6)
    np.testing.assert_array_equal(out["action_pad_mask"][0], [True] * 5 + [False] * 2)


def test_allocate_threads():
    alloc = allocate_threads(16, np.array([0.5, 0.3, 0.2]))
    assert alloc.sum() == 16 and (alloc >= 1).all()
    alloc = allocate_threads(3, np.array([0.99, 0.005, 0.005]))
    assert alloc.sum() == 3 and (alloc >= 1).all()


def test_combine_statistics():
    a = {"action": {"mean": [0.0], "std": [1.0], "min": [-1.0], "max": [1.0]},
         "num_transitions": 100, "num_trajectories": 10}
    b = {"action": {"mean": [2.0], "std": [1.0], "min": [0.0], "max": [3.0]},
         "num_transitions": 100, "num_trajectories": 10}
    out = combine_dataset_statistics([a, b])
    np.testing.assert_allclose(out["action"]["mean"], [1.0])
    np.testing.assert_allclose(out["action"]["min"], [-1.0])
    np.testing.assert_allclose(out["action"]["max"], [3.0])
    # combined std: sqrt(mean of (var + mean_dev^2)) = sqrt(1 + 1)
    np.testing.assert_allclose(out["action"]["std"], [np.sqrt(2.0)])


def test_tfrecord_example_roundtrip(tmp_path):
    examples = []
    for i in range(3):
        features = {
            "steps/action": np.arange(6, dtype=np.float32) + i,
            "steps/is_last": np.array([0, 0, 1], dtype=np.int64),
            "steps/observation/image": [b"jpegbytes0", b"jpegbytes1",
                                        b"jpegbytes2"],
            "language": [f"instruction {i}".encode()],
        }
        examples.append(encode_example(features))
    path = str(tmp_path / "test.tfrecord")
    write_tfrecord(path, examples)

    records = list(read_tfrecord(path, validate_crc=True))
    assert len(records) == 3
    parsed = parse_example(records[1])
    np.testing.assert_allclose(
        parsed["steps/action"], np.arange(6, dtype=np.float32) + 1
    )
    np.testing.assert_array_equal(parsed["steps/is_last"], [0, 0, 1])
    assert parsed["steps/observation/image"][2] == b"jpegbytes2"
    assert parsed["language"][0] == b"instruction 1"


def test_muse_embedding_table_and_fallback(tmp_path):
    import numpy as np

    from hypervla_tpu.data.text_processing import MuseEmbedding

    path = tmp_path / "muse.npz"
    np.savez(
        path,
        strings=np.array([b"pick up the block", "close the drawer"], object),
        embeddings=np.stack([np.full(16, 0.5), np.full(16, -0.25)]).astype(
            np.float32
        ),
    )
    muse = MuseEmbedding(table_path=str(path))
    out = muse.encode([b"pick up the block", "close the drawer", "unknown"])
    assert out.shape == (3, 16)
    np.testing.assert_array_equal(out[0], np.full(16, 0.5, np.float32))
    np.testing.assert_array_equal(out[1], np.full(16, -0.25, np.float32))
    # unknown string: deterministic unit-norm fallback
    np.testing.assert_allclose(np.linalg.norm(out[2]), 1.0, rtol=1e-5)
    again = muse.encode(["unknown"])[0]
    np.testing.assert_array_equal(out[2], again)
