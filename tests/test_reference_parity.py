"""Bit-match parity against the ACTUAL reference implementation.

The goldens in tests/goldens/reference_parity/ were produced by RUNNING the
reference repo's HyperVLA (it is also JAX/Flax) on this exact config +
batch: its hypernet params, the base params it generated, and the action it
sampled. Loading its params into OUR model must reproduce both the generated
weights and the sampled actions within 1e-5 (BASELINE.json north star:
"actions bit-match reference <= 1e-5")."""
import os

import jax
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(
    os.path.dirname(__file__), "goldens", "reference_parity"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "io.npz")),
    reason="reference parity goldens not generated",
)


@pytest.fixture(scope="module")
def golden():
    import flax.serialization

    def load(name):
        with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
            return flax.serialization.msgpack_restore(f.read())

    io = dict(np.load(os.path.join(GOLDEN_DIR, "io.npz")))
    return {
        "hypernet_params": load("hypernet_params.msgpack"),
        "generated_base_params": load("generated_base_params.msgpack"),
        "io": io,
    }


@pytest.fixture(scope="module")
def our_model(golden):
    from helpers import make_example_batch

    from hypervla_tpu.configs import tiny_test_config
    from hypervla_tpu.models.hypervla import HyperVLA
    from hypervla_tpu.utils.convert import convert_reference_params

    config = tiny_test_config(encoder_type="SmallStem")
    batch = make_example_batch(batch_size=2, image_size=64)
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    ref_params = convert_reference_params(golden["hypernet_params"])
    # the trees must be structurally identical after the rename
    assert jax.tree_util.tree_structure(
        ref_params
    ) == jax.tree_util.tree_structure(model.params)
    return model.replace(params=ref_params)


def test_generated_weights_match_reference(golden, our_model):
    io = golden["io"]
    instr = {
        "language_instruction": {
            "input_ids": io["input_ids"],
            "attention_mask": io["attention_mask"],
            "token_embedding": io["token_embedding"],
        }
    }
    base_params, _, _ = our_model.create_tasks(instruction_dict=instr)
    from hypervla_tpu.utils.convert import convert_reference_params

    ref_gen = convert_reference_params(golden["generated_base_params"])
    flat_ours = jax.tree_util.tree_flatten_with_path(base_params)[0]
    flat_ref = dict(
        ("/".join(str(k.key) for k in p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_gen)[0]
    )
    assert len(flat_ours) == len(flat_ref)
    for path, ours in flat_ours:
        name = "/".join(str(k.key) for k in path)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(flat_ref[name]), atol=1e-5,
            err_msg=name,
        )


def test_actions_match_reference(golden, our_model):
    io = golden["io"]
    instr = {
        "language_instruction": {
            "input_ids": io["input_ids"],
            "attention_mask": io["attention_mask"],
            "token_embedding": io["token_embedding"],
        }
    }
    base_params, tasks, _ = our_model.create_tasks(instruction_dict=instr)
    action, _ = our_model.sample_actions(
        io["image"],
        instr,
        tasks,
        io["pad_mask"],
        base_params,
        rng=jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(
        np.asarray(action), io["action"], atol=1e-5
    )
