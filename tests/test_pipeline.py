"""End-to-end input-pipeline tests on synthetic fixture datasets."""
import io
import os

import numpy as np
import pytest

from hypervla_tpu.data.dataset import (
    make_dataset_from_rlds,
    make_interleaved_dataset,
    make_single_dataset,
)
from hypervla_tpu.data.pipeline import Pipeline
from hypervla_tpu.data.sources import NpzTrajectorySource


def _encode_jpeg(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def fixture_data_dir(tmp_path_factory):
    """Two tiny npz datasets with JPEG-encoded image observations."""
    root = tmp_path_factory.mktemp("datasets")
    rng = np.random.RandomState(0)
    for ds_idx, name in enumerate(["fixture_a", "fixture_b"]):
        ds_dir = root / name
        os.makedirs(ds_dir)
        for ep in range(6):
            traj_len = 8 + ep
            images = np.array(
                [
                    _encode_jpeg(
                        rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                    )
                    for _ in range(traj_len)
                ],
                dtype=object,
            )
            traj = {
                "observation": {
                    "image": images,
                    "state": rng.randn(traj_len, 8).astype(np.float32),
                },
                "action": rng.randn(traj_len, 7).astype(np.float32),
                "language_instruction": np.array(
                    [f"task {ds_idx}".encode()] * traj_len, dtype=object
                ),
            }
            NpzTrajectorySource.write_trajectory(
                str(ds_dir / f"episode_{ep:03d}.npz"), traj
            )
    return str(root)


def _dataset_kwargs(name, data_dir):
    return dict(
        name=name,
        data_dir=data_dir,
        image_obs_keys={"primary": "image"},
        proprio_obs_key="state",
        language_key="language_instruction",
        action_proprio_normalization_type="normal",
        seed=0,
    )


def test_make_dataset_from_rlds_standardized(fixture_data_dir):
    dataset, stats = make_dataset_from_rlds(
        **_dataset_kwargs("fixture_a", fixture_data_dir), train=True
    )
    traj = next(iter(dataset))
    assert set(traj.keys()) == {
        "observation", "task", "action", "dataset_name"
    }
    assert "image_primary" in traj["observation"]
    assert "proprio" in traj["observation"]
    assert traj["task"]["language_instruction"][0] == b"task 0"
    assert stats["action"]["mean"] is not None
    # normalized actions: mean approx 0 over dataset
    assert np.isfinite(traj["action"]).all()


def test_initial_image_plumbing(fixture_data_dir):
    dataset, _ = make_dataset_from_rlds(
        **_dataset_kwargs("fixture_a", fixture_data_dir),
        train=True,
        add_initial_image=True,
    )
    traj = next(iter(dataset))
    assert "initial_state" in traj
    assert traj["initial_state"]["image_primary"].shape[:2] == (
        len(traj["action"]), 1
    )
    # all frames share the episode's first image
    assert (
        traj["initial_state"]["image_primary"][0, 0]
        == traj["initial_state"]["image_primary"][-1, 0]
    )


def test_make_single_dataset_full_stack(fixture_data_dir):
    dataset = make_single_dataset(
        _dataset_kwargs("fixture_a", fixture_data_dir),
        train=True,
        traj_transform_kwargs=dict(
            window_size=1, action_horizon=4, goal_relabeling_strategy="uniform"
        ),
        frame_transform_kwargs=dict(resize_size={"primary": (32, 32)}),
    )
    traj = next(iter(dataset))
    # frame transforms decoded + resized the whole chunked trajectory
    assert traj["observation"]["image_primary"].shape[1:] == (1, 32, 32, 3)
    assert traj["observation"]["image_primary"].dtype == np.uint8
    assert traj["action"].shape[1:] == (1, 4, 7)


def test_interleaved_dataset_batches(fixture_data_dir):
    dataset = make_interleaved_dataset(
        [
            _dataset_kwargs("fixture_a", fixture_data_dir),
            _dataset_kwargs("fixture_b", fixture_data_dir),
        ],
        sample_weights=[0.5, 0.5],
        train=True,
        shuffle_buffer_size=50,
        traj_transform_kwargs=dict(window_size=1, action_horizon=4),
        frame_transform_kwargs=dict(resize_size={"primary": (32, 32)}),
        batch_size=4,
        seed=0,
    )
    it = iter(dataset)
    batch = next(it)
    assert batch["observation"]["image_primary"].shape == (4, 1, 32, 32, 3)
    assert batch["action"].shape == (4, 1, 4, 7)
    assert batch["observation"]["timestep_pad_mask"].shape == (4, 1)
    # both datasets appear over a few batches
    names = set()
    for _ in range(5):
        b = next(it)
        names.update(np.asarray(b["dataset_name"]).reshape(-1).tolist())
    assert len(names) == 2


def test_pipeline_primitives():
    p = Pipeline.from_iterable(lambda: range(10))
    assert list(p.map(lambda x: x * 2)) == [x * 2 for x in range(10)]
    assert list(p.filter(lambda x: x % 2 == 0)) == [0, 2, 4, 6, 8]
    assert len(list(p.shuffle(4, seed=0))) == 10
    assert sorted(list(p.shuffle(4, seed=0))) == list(range(10))
    batches = list(
        Pipeline.from_iterable(lambda: ({"x": np.ones(2)} for _ in range(5)))
        .batch(2)
    )
    assert len(batches) == 2 and batches[0]["x"].shape == (2, 2)
    # weighted sampling heavily favors the first pipeline
    mixed = Pipeline.sample_from_pipelines(
        [
            Pipeline.from_iterable(lambda: iter([0] * 100)),
            Pipeline.from_iterable(lambda: iter([1] * 100)),
        ],
        weights=[0.9, 0.1],
        seed=0,
    )
    vals = list(mixed.take(50))
    assert vals.count(0) > 30


def test_prefetch_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    p = Pipeline.from_iterable(bad_gen).prefetch(2)
    it = iter(p)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)
