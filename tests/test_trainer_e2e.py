"""End-to-end smoke test: fixture data -> pipeline -> HyperVLA -> GSPMD train
loop -> checkpoint -> reload -> closed-loop inference. The full minimum slice."""
import io
import os

import jax
import numpy as np
import pytest

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.data.sources import NpzTrajectorySource

pytestmark = pytest.mark.e2e


def _encode_jpeg(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.RandomState(0)
    ds_dir = root / "fixture_train"
    os.makedirs(ds_dir)
    instructions = [b"close top drawer", b"pick up the block"]
    for ep in range(4):
        traj_len = 10
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
                [instructions[ep % 2]] * traj_len, dtype=object
            ),
        }
        NpzTrajectorySource.write_trajectory(
            str(ds_dir / f"ep_{ep:03d}.npz"), traj
        )
    return str(root)


def test_train_checkpoint_infer_roundtrip(fixture_root, tmp_path):
    from hypervla_tpu.train.trainer import train

    config = tiny_test_config(encoder_type="SmallStem")
    config["dataset_kwargs"] = {
        "batch_size": 8,
        "shuffle_buffer_size": 20,
        "text_tokenizer": "t5-base",
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
    config["save_interval"] = 2
    config["log_interval"] = 1
    config["save_param_EMA"] = True
    config["EMA_start_step"] = 1
    config["eval_datasets"] = ["fixture_train"]
    config["eval_interval"] = 2

    save_dir = str(tmp_path / "run")
    state = train(config, save_dir=save_dir, num_steps=2)
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(save_dir, "config.json"))
    assert os.path.isdir(os.path.join(save_dir, "2"))
    assert os.path.exists(os.path.join(save_dir, "2", "EMA_params.pkl"))

    # reload + closed-loop inference on the trained checkpoint
    from hypervla_tpu.eval.model_loading import load_hypervla_policy
    from hypervla_tpu.eval.model_loading import build_text_encoder

    wrapper = load_hypervla_policy(
        save_dir, policy_setup="google_robot", image_size=64,
        action_ensemble=True, crop=False,
    )
    encode = build_text_encoder(wrapper.model, max_length=8)
    instruction = encode("close top drawer")
    wrapper.reset("close top drawer", instruction)
    image = np.zeros((64, 64, 3), dtype=np.uint8)
    raw_action, action, _, _, _ = wrapper.step(image)
    assert action.shape == (7,)
    assert np.isfinite(action).all()


def test_resume_from_checkpoint(fixture_root, tmp_path):
    from hypervla_tpu.train.trainer import train

    config = tiny_test_config(encoder_type="SmallStem")
    config["dataset_kwargs"] = {
        "batch_size": 8,
        "shuffle_buffer_size": 20,
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
    config["save_interval"] = 1
    save_dir = str(tmp_path / "resume_run")
    train(config, save_dir=save_dir, num_steps=1)
    state = train(config, save_dir=save_dir, num_steps=2)  # resumes at 1
    assert int(state.step) == 2


def test_finetune_warm_start(fixture_root, tmp_path):
    """Pretrain 1 step with EMA, then fine-tune warm-started from the EMA
    pickle (the reference's LIBERO few-shot flow)."""
    from hypervla_tpu.train.trainer import train

    base = tiny_test_config(encoder_type="SmallStem")
    base["dataset_kwargs"] = {
        "batch_size": 8,
        "shuffle_buffer_size": 20,
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
    base["save_interval"] = 1
    base["save_param_EMA"] = True
    base["EMA_start_step"] = 0
    pretrain_dir = str(tmp_path / "pretrain")
    train(base, save_dir=pretrain_dir, num_steps=1)
    assert os.path.exists(os.path.join(pretrain_dir, "1", "EMA_params.pkl"))

    finetune = dict(base)
    finetune["pretrained_checkpoint_path"] = pretrain_dir
    finetune["pretrained_checkpoint_step"] = 1
    state = train(finetune, save_dir=None, num_steps=1)
    assert int(state.step) == 1


def test_fewshot_finetune_then_libero_eval(fixture_root, tmp_path, monkeypatch):
    """The reference's LIBERO few-shot flow end to end: pretrain with EMA ->
    warm-start finetune from EMA_params.pkl -> closed-loop eval of the
    finetuned checkpoint on the (mocked) libero_90 suite with the train-split
    protocol (/root/reference/data/libero/evaluate.py:92-104)."""
    import pickle
    import sys
    import types

    from hypervla_tpu.train.trainer import train

    base = tiny_test_config(encoder_type="SmallStem")
    base["dataset_kwargs"] = {
        "batch_size": 8,
        "shuffle_buffer_size": 20,
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
    base["save_interval"] = 1
    base["save_param_EMA"] = True
    base["EMA_start_step"] = 0
    pretrain_dir = str(tmp_path / "pretrain")
    train(base, save_dir=pretrain_dir, num_steps=1)

    finetune = dict(base)
    finetune["pretrained_checkpoint_path"] = pretrain_dir
    finetune["pretrained_checkpoint_step"] = 1
    finetune_dir = str(tmp_path / "finetune")
    train(finetune, save_dir=finetune_dir, num_steps=1)
    assert os.path.isdir(os.path.join(finetune_dir, "1"))

    # ---- eval handoff: load the finetuned policy, run the mocked suite ----
    from hypervla_tpu.eval import libero as libero_driver
    from hypervla_tpu.eval.model_loading import (
        build_text_encoder,
        load_hypervla_policy,
    )
    from test_sim_evaluators import _mock_suite_90

    policy = load_hypervla_policy(
        finetune_dir, policy_setup="libero", image_size=64, crop=False,
    )
    encode = build_text_encoder(policy.model, max_length=8)

    MockSuite = _mock_suite_90(["task_x", "task_y"])

    class MockEnv:
        def __init__(self, **kwargs):
            self.t = 0

        def reset(self):
            self.t = 0

        def seed(self, s):
            pass

        def set_init_state(self, s):
            return {"agentview_image": np.zeros((64, 64, 3), np.uint8)}

        def step(self, action):
            assert np.asarray(action).shape == (7,)
            assert np.isfinite(np.asarray(action)).all()
            self.t += 1
            return (
                {"agentview_image": np.zeros((64, 64, 3), np.uint8)},
                0.0, self.t >= 2, {},
            )

        def close(self):
            pass

    libero_pkg = types.ModuleType("libero")
    libero_sub = types.ModuleType("libero.libero")
    libero_sub.benchmark = types.SimpleNamespace(
        get_benchmark_dict=lambda: {"libero_90": MockSuite}
    )
    libero_sub.get_libero_path = lambda name: "/tmp"
    libero_envs = types.ModuleType("libero.libero.envs")
    libero_envs.OffScreenRenderEnv = MockEnv
    monkeypatch.setitem(sys.modules, "libero", libero_pkg)
    monkeypatch.setitem(sys.modules, "libero.libero", libero_sub)
    monkeypatch.setitem(sys.modules, "libero.libero.envs", libero_envs)

    split_file = tmp_path / "task_split.pkl"
    with open(split_file, "wb") as f:
        pickle.dump((["task_y_demo.hdf5"], ["task_x_demo.hdf5"]), f)

    results = libero_driver.evaluate(
        policy,
        text_encode=encode,
        benchmark_name="libero_90",
        eval_path=str(tmp_path / "eval"),
        num_episodes=1,
        split="train",
        split_file=str(split_file),
    )
    assert set(results) == {"task_y"}
    assert 0.0 <= results["task_y"] <= 1.0
