"""Smoke test for the original-Octo pretraining driver (scripts/octo_train.py):
fixture npz data -> pipeline -> OctoModel (image tokenizer + diffusion head)
-> train steps -> checkpoint."""
import io
import os

import numpy as np
import pytest

from hypervla_tpu.data.sources import NpzTrajectorySource
from hypervla_tpu.utils.spec import ModuleSpec

pytestmark = pytest.mark.slow


def _encode_jpeg(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("octo_train_data")
    rng = np.random.RandomState(0)
    ds_dir = root / "fixture_train"
    os.makedirs(ds_dir)
    for ep in range(2):
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
                [b"pick up the block"] * traj_len, dtype=object
            ),
        }
        NpzTrajectorySource.write_trajectory(
            str(ds_dir / f"ep_{ep:03d}.npz"), traj
        )
    return str(root)


def _octo_train_config(fixture_root):
    return {
        "seed": 0,
        "num_steps": 2,
        "log_interval": 1,
        "window_size": 1,
        "base_net_kwargs": {"action_horizon": 2, "action_dim": 7},
        "hypernet_kwargs": {},
        "optimizer": {
            "learning_rate": {
                "name": "constant",
                "init_value": 0.0,
                "peak_value": 1e-4,
                "warmup_steps": 1,
            },
            "clip_gradient": 1.0,
            "weight_decay": 0.01,
        },
        "dataset_kwargs": {
            "batch_size": 8,
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
        },
        "model": {
            "observation_tokenizers": {
                "primary": ModuleSpec.create(
                    "hypervla_tpu.models.tokenizers:ImageTokenizer",
                    obs_stack_keys=["image_primary"],
                    task_stack_keys=[],
                    encoder=ModuleSpec.create(
                        "hypervla_tpu.models.vit_encoders:SmallStem16",
                        features=(32, 32),
                        kernel_sizes=(3, 3),
                        strides=(8, 2),
                        padding=(1, 1),
                        num_features=16,
                    ),
                ),
            },
            "heads": {
                "action": ModuleSpec.create(
                    "hypervla_tpu.models.action_heads:DiffusionActionHead",
                    readout_key="readout_action",
                    use_map=False,
                    action_horizon=2,
                    action_dim=7,
                    n_diffusion_samples=1,
                    time_dim=8,
                    num_blocks=1,
                    hidden_dim=16,
                ),
            },
            "readouts": {"action": 1},
            "transformer_kwargs": {
                "num_layers": 1,
                "mlp_dim": 32,
                "num_attention_heads": 2,
                "dropout_rate": 0.0,
                "attention_dropout_rate": 0.0,
                "add_position_embedding": False,
            },
            "token_embedding_size": 16,
            "max_horizon": 4,
            "repeat_task_tokens": False,
            "use_correct_attention": True,
        },
        "text_processor": None,
        "save_interval": 2,
    }


def test_octo_train_smoke(fixture_root, tmp_path):
    from scripts.octo_train import run

    config = _octo_train_config(fixture_root)
    save_dir = str(tmp_path / "octo_run")
    model, params = run(config, save_dir=save_dir, num_steps=2)
    assert params is not None
    leaves = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(params)]
    assert all(np.isfinite(x).all() for x in leaves)
    assert os.path.isdir(os.path.join(save_dir, "2"))
