"""Checkpoint artifact-contract tests: save_pretrained/load_pretrained
round-trip through config.json + example_batch.msgpack + orbax step dirs."""
import os

import jax
import numpy as np

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.models.hypervla import HyperVLA

from helpers import make_example_batch
import pytest

pytestmark = pytest.mark.slow


def test_save_load_roundtrip(tmp_path):
    config = tiny_test_config(encoder_type="SmallStem")
    batch = make_example_batch(image_size=64)
    model = HyperVLA.from_config(
        config, batch, jax.random.PRNGKey(0),
        dataset_statistics={"action": {"mean": np.zeros(7), "std": np.ones(7)}},
    )
    ckpt_dir = str(tmp_path / "ckpt")
    model.save_pretrained(step=42, checkpoint_path=ckpt_dir)

    assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "example_batch.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "dataset_statistics.json"))
    assert os.path.isdir(os.path.join(ckpt_dir, "42"))

    loaded = HyperVLA.load_pretrained(ckpt_dir)
    flat_a = jax.tree_util.tree_leaves_with_path(model.params)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded.params)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # loaded model must produce identical generated weights
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}
    gen_a, _, _ = model.create_tasks(instruction_dict=instr)
    gen_b, _, _ = loaded.create_tasks(instruction_dict=instr)
    for a, b in zip(
        jax.tree_util.tree_leaves(gen_a), jax.tree_util.tree_leaves(gen_b)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
