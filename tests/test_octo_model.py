"""OctoModel facade test: config-driven construction, create_tasks,
sample_actions, checkpoint round-trip."""
import jax
import numpy as np
import pytest

from hypervla_tpu.data.text_processing import FallbackTokenizer
from hypervla_tpu.models.octo_model import OctoModel

pytestmark = [pytest.mark.slow, pytest.mark.parity]


class _TinyTextProcessor:
    def __init__(self):
        self.tok = FallbackTokenizer()

    def encode(self, strings):
        return self.tok(strings, max_length=6)


def _octo_config():
    return {
        "model": {
            "observation_tokenizers": {},
            "heads": {
                "action": {
                    "module": "hypervla_tpu.models.action_heads",
                    "name": "ContinuousActionHead",
                    "args": [],
                    "kwargs": {
                        "readout_key": "readout_action",
                        "use_map": False,
                        "action_horizon": 2,
                        "action_dim": 7,
                    },
                }
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
    }


def _example_batch(batch=1, horizon=2):
    rng = np.random.RandomState(0)
    return {
        "observation": {
            "image_patches": {
                "token": rng.randn(batch, horizon, 6, 8).astype(np.float32),
                "mask": np.ones((batch, horizon, 6), dtype=bool),
            },
            "timestep_pad_mask": np.ones((batch, horizon), dtype=bool),
        },
        "task": {
            "language_instruction": {
                "input_ids": np.ones((batch, 6), np.int32),
                "attention_mask": np.ones((batch, 6), np.int32),
                "token_embedding": rng.randn(batch, 6, 12).astype(np.float32),
            },
            "pad_mask_dict": {
                "language_instruction": np.ones(batch, dtype=bool)
            },
        },
    }


def test_octo_model_end_to_end(tmp_path):
    config = _octo_config()
    config["model"]["use_pretrained_image_tokenizer"] = True
    batch = _example_batch()
    model = OctoModel.from_config(
        config, batch, text_processor=_TinyTextProcessor(),
        text_embed_fn=lambda ids, mask: np.random.RandomState(0).randn(
            ids.shape[0], ids.shape[1], 12
        ).astype(np.float32),
    )
    tasks = model.create_tasks(texts=["pick up the fork"])
    assert "token_embedding" in tasks["language_instruction"]

    action = model.sample_actions(
        batch["observation"],
        batch["task"],
        unnormalization_statistics={
            "mean": np.zeros(7, np.float32),
            "std": 2 * np.ones(7, np.float32),
        },
        rng=jax.random.PRNGKey(0),
    )
    assert action.shape == (1, 2, 7)

    ckpt = str(tmp_path / "octo")
    model.save_pretrained(step=1, checkpoint_path=ckpt)
    loaded = OctoModel.load_pretrained(ckpt)
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(loaded.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_octo_load_pretrained_hf_uri(tmp_path, monkeypatch):
    """`hf://org/repo` resolution (parity: octo/model/octo_model.py:266-273)
    against a pre-populated local HF cache — the egress-less path this
    environment actually uses."""
    config = _octo_config()
    config["model"]["use_pretrained_image_tokenizer"] = True
    batch = _example_batch()
    model = OctoModel.from_config(
        config, batch, text_processor=_TinyTextProcessor()
    )

    cache = tmp_path / "hf_cache"
    repo = cache / "models--test-org--tiny-octo"
    snapshot = repo / "snapshots" / "abcdef123456"
    snapshot.mkdir(parents=True)
    (repo / "refs").mkdir()
    (repo / "refs" / "main").write_text("abcdef123456")
    model.save_pretrained(step=1, checkpoint_path=str(snapshot))

    monkeypatch.setenv("HF_HUB_CACHE", str(cache))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    loaded = OctoModel.load_pretrained("hf://test-org/tiny-octo")
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(loaded.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="hub snapshots pin"):
        OctoModel.load_pretrained("hf://test-org/tiny-octo", step=1)

    with pytest.raises(FileNotFoundError, match="not in the local"):
        OctoModel.load_pretrained("hf://test-org/definitely-absent")
