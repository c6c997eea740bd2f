"""VisualizationCallback / RolloutCallback tests (parity:
octo/utils/train_callbacks.py Visualization/RolloutVisualization)."""
import io
import os

import jax
import numpy as np
import pytest

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.data.sources import NpzTrajectorySource
from hypervla_tpu.models.hypervla import HyperVLA

pytestmark = pytest.mark.slow


def _encode_jpeg(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("viz_data")
    rng = np.random.RandomState(0)
    ds_dir = root / "fixture_train"
    os.makedirs(ds_dir)
    for ep in range(3):
        traj_len = 8
        traj = {
            "observation": {
                "image": np.array(
                    [
                        _encode_jpeg(
                            rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                        )
                        for _ in range(traj_len)
                    ],
                    dtype=object,
                ),
            },
            "action": rng.randn(traj_len, 7).astype(np.float32),
            "language_instruction": np.array(
                [b"close top drawer"] * traj_len, dtype=object
            ),
        }
        NpzTrajectorySource.write_trajectory(
            str(ds_dir / f"ep_{ep:03d}.npz"), traj
        )
    return str(root)


def test_visualization_callback_metrics(fixture_root):
    from hypervla_tpu.train.trainer import (
        _build_visualization_callback,
        _prime_example_batch,
        build_frozen_encoders,
        make_process_batch,
        make_train_datasets,
    )

    config = tiny_test_config(encoder_type="SmallStem")
    config["dataset_kwargs"] = {
        "batch_size": 4,
        "shuffle_buffer_size": 10,
        "tokenizer_max_length": 8,
        "resize_size": {"primary": (64, 64)},
        "dataset_kwargs_list": [
            dict(
                name="fixture_train",
                data_dir=fixture_root,
                image_obs_keys={"primary": "image"},
                language_key="language_instruction",
                action_proprio_normalization_type="normal",
            )
        ],
    }
    config["viz_datasets"] = ["fixture_train"]
    config["viz_num_trajs"] = 2

    dataset = make_train_datasets(config)
    process_batch = make_process_batch(config)
    example = _prime_example_batch(process_batch(next(iter(dataset))), config)
    model = HyperVLA.from_config(config, example, jax.random.PRNGKey(0))

    text_apply, _, t5_params, _ = build_frozen_encoders(config)
    text_encode = lambda ids, m: text_apply(t5_params, ids, m)  # noqa: E731
    cb = _build_visualization_callback(config, model, text_encode, None)
    assert cb is not None
    metrics = cb(model.params, step=1)
    keys = {k for k in metrics}
    assert f"visualizer/fixture_train/mse" in keys
    for name in ("mse", "gripper_correct", "xyz_angle", "xyz_close", "moving"):
        v = metrics[f"visualizer/fixture_train/{name}"]
        assert np.isfinite(v), (name, v)


def test_rollout_callback_mock_env():
    from hypervla_tpu.eval.visualization import RolloutVisualizer
    from hypervla_tpu.train.callbacks import RolloutCallback

    class MockEnv:
        def __init__(self):
            self.t = 0

        def reset(self, **kwargs):
            self.t = 0
            return {"image_primary": np.zeros((8, 8, 3), np.uint8)}, {}

        def step(self, action):
            self.t += 1
            done = self.t >= 5
            return (
                {"image_primary": np.zeros((8, 8, 3), np.uint8)},
                1.0 if done else 0.0,
                done,
                False,
                {},
            )

    rv = RolloutVisualizer(env_fn=MockEnv, name="mock", max_episode_length=10)
    cb = RolloutCallback(
        [rv], policy_fn_builder=lambda params: (lambda obs: np.zeros(7)),
        n_rollouts=2,
    )
    metrics = cb(params=None, step=1)
    assert metrics["mock/mean_length"] == 5.0
    assert metrics["mock/success_rate"] == 1.0


def test_rollout_callback_env_failure_is_nonfatal():
    from hypervla_tpu.eval.visualization import RolloutVisualizer
    from hypervla_tpu.train.callbacks import RolloutCallback

    def broken_env():
        raise ImportError("simulator not installed")

    rv = RolloutVisualizer(env_fn=broken_env, name="broken")
    cb = RolloutCallback([rv], policy_fn_builder=lambda p: (lambda o: None))
    assert cb(params=None, step=1) == {}
