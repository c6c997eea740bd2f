"""The heart-of-the-system tests: WeightPlan metadata, the packed hypernet
fan-out, and the step-0 bias-init equivalence protocol."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.models.hypervla import HyperVLA
from hypervla_tpu.models.weight_plan import InitOptions, init_base_net

from helpers import make_example_batch

pytestmark = [pytest.mark.slow, pytest.mark.heavy]


@pytest.fixture(scope="module")
def smallstem_setup():
    config = tiny_test_config(encoder_type="SmallStem")
    batch = make_example_batch(image_size=64)
    return config, batch


@pytest.fixture(scope="module")
def dino_setup():
    config = tiny_test_config(encoder_type="DINOv2")
    batch = make_example_batch(
        image_size=224, initial_image=True, initial_patch_dim=32
    )
    return config, batch


def test_weight_plan_metadata_smallstem(smallstem_setup):
    config, batch = smallstem_setup
    rng = jax.random.PRNGKey(0)
    base_net, init_params, flat, metadata = init_base_net(config, batch, rng)
    # one token per top-level module: 4 SmallStem convs(+norms) grouped by
    # module, transformer blocks, extras, action head
    assert metadata["block_num"] == len(metadata["layer_token_mask"])
    assert metadata["total_param_num"] == flat.shape[0]
    # flat vector matches the tree leaves in flatten order
    leaves = jax.tree_util.tree_leaves(init_params)
    np.testing.assert_array_equal(
        flat, np.concatenate([np.ravel(p) for p in leaves])
    )
    # every info entry has the output head fields
    for name, info in metadata["output_head_info"].items():
        assert set(info.keys()) == {
            "output_dim", "generation_flag", "init_strategy", "init_variance"
        }


def test_weight_plan_shared_image_encoder(dino_setup):
    config, batch = dino_setup
    rng = jax.random.PRNGKey(0)
    _, _, _, metadata = init_base_net(config, batch, rng)
    # share_layer_index=True -> a single layer token
    assert metadata["block_num"] == 1
    gen = metadata["generation_flag"]
    # the image encoder is shared (not generated)
    assert not any(
        jax.tree_util.tree_leaves(gen["encoder"]["image_encoder"])
    )
    # the tiny transformer and action head are generated
    assert all(jax.tree_util.tree_leaves(gen["encoder"]["Transformer_0"]))
    assert all(jax.tree_util.tree_leaves(gen["action_head"]))


def test_step0_equivalence_smallstem(smallstem_setup):
    """HN(zero kernels) + bias-init == freshly initialized base net, exactly."""
    config, batch = smallstem_setup
    rng = jax.random.PRNGKey(7)
    model = HyperVLA.from_config(config, batch, rng)

    _, base_net_rng = jax.random.split(rng)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    _, init_params, _, _ = init_base_net(config, example, base_net_rng)

    instruction_dict = {
        "language_instruction": example["task"]["language_instruction"]
    }
    generated, tasks, _ = model.create_tasks(instruction_dict=instruction_dict)

    flat_gen = jax.tree_util.tree_leaves_with_path(generated)
    flat_init = jax.tree_util.tree_leaves_with_path(init_params)
    assert len(flat_gen) == len(flat_init)
    for (path_g, g), (path_i, i) in zip(flat_gen, flat_init):
        assert path_g == path_i
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(i),
            err_msg=f"step-0 mismatch at {jax.tree_util.keystr(path_g)}",
        )


def test_step0_equivalence_dino_flagship_topology(dino_setup):
    """Same protocol for the flagship topology: shared DINOv2 + single layer
    token + initial-image conditioning."""
    config, batch = dino_setup
    rng = jax.random.PRNGKey(3)
    model = HyperVLA.from_config(config, batch, rng)

    _, base_net_rng = jax.random.split(rng)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    _, init_params, _, _ = init_base_net(config, example, base_net_rng)

    instruction_dict = {
        "language_instruction": example["task"]["language_instruction"]
    }
    generated, _, _ = model.create_tasks(
        instruction_dict=instruction_dict,
        initial_state=example["initial_state"],
    )
    flat_gen = jax.tree_util.tree_leaves_with_path(generated)
    flat_init = jax.tree_util.tree_leaves_with_path(init_params)
    for (path_g, g), (path_i, i) in zip(flat_gen, flat_init):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(i),
            err_msg=f"step-0 mismatch at {jax.tree_util.keystr(path_g)}",
        )


def test_generated_params_depend_on_task_after_training_step(smallstem_setup):
    """After perturbing HN kernels, different instructions must give different
    generated weights (the packed fan-out actually consumes the context)."""
    config, batch = smallstem_setup
    rng = jax.random.PRNGKey(0)
    model = HyperVLA.from_config(config, batch, rng)
    # nudge all output-head kernels away from zero
    params = jax.tree_util.tree_map(lambda p: p + 0.01, model.params)
    model = model.replace(params=params)

    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = example["task"]["language_instruction"]
    gen1, _, _ = model.create_tasks(
        instruction_dict={"language_instruction": instr}
    )
    instr2 = {
        "input_ids": instr["input_ids"],
        "attention_mask": instr["attention_mask"],
        "token_embedding": instr["token_embedding"] + 1.0,
    }
    gen2, _, _ = model.create_tasks(
        instruction_dict={"language_instruction": instr2}
    )
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), gen1, gen2
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_sample_actions_roundtrip(smallstem_setup):
    config, batch = smallstem_setup
    rng = jax.random.PRNGKey(1)
    model = HyperVLA.from_config(config, batch, rng)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instruction_dict = {
        "language_instruction": example["task"]["language_instruction"]
    }
    base_params, tasks, _ = model.create_tasks(instruction_dict=instruction_dict)
    action, _ = model.sample_actions(
        example["observation"]["image_primary"],
        instruction_dict,
        tasks,
        example["observation"]["timestep_pad_mask"],
        base_params,
        rng=jax.random.PRNGKey(2),
    )
    assert action.shape == (1, 2, 7)  # (batch, horizon, action_dim)
    assert np.isfinite(np.asarray(action)).all()
    # gripper dim is binary
    assert set(np.unique(np.asarray(action[..., -1]))) <= {0.0, 1.0}


def test_two_models_share_jitted_sample_actions(smallstem_setup):
    """Regression: jit cache-key comparison of two coexisting models must not
    raise on the static metadata/example-batch fields."""
    config, batch = smallstem_setup
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}

    model_a = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    model_b = HyperVLA.from_config(config, batch, jax.random.PRNGKey(1))
    for model in (model_a, model_b):
        base_params, tasks, _ = model.create_tasks(instruction_dict=instr)
        action, _ = model.sample_actions(
            example["observation"]["image_primary"],
            instr,
            tasks,
            example["observation"]["timestep_pad_mask"],
            base_params,
            rng=jax.random.PRNGKey(2),
        )
        assert np.isfinite(np.asarray(action)).all()


def test_full_generation_strategy_step0_equivalence():
    """generation_strategy='full': one output head emits the entire flat
    param vector; bias init still makes HN(task) == fresh base net."""
    config = tiny_test_config(encoder_type="SmallStem")
    config["hypernet_kwargs"]["generation_strategy"] = "full"
    batch = make_example_batch(image_size=64)
    rng = jax.random.PRNGKey(11)
    model = HyperVLA.from_config(config, batch, rng)
    assert "output_head" in model.params  # single Dense head

    _, base_net_rng = jax.random.split(rng)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    _, init_params, _, _ = init_base_net(config, example, base_net_rng)

    instr = {"language_instruction": example["task"]["language_instruction"]}
    generated, _, _ = model.create_tasks(instruction_dict=instr)
    for (pg, g), (pi, i) in zip(
        jax.tree_util.tree_leaves_with_path(generated),
        jax.tree_util.tree_leaves_with_path(init_params),
    ):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(i),
            err_msg=f"step-0 mismatch at {jax.tree_util.keystr(pg)}",
        )


def test_share_tf_output_head():
    """share_TF_output_head: all transformer blocks are generated by ONE head
    seeded from block 0 — at step 0 every block equals block 0's init."""
    config = tiny_test_config(encoder_type="SmallStem")
    config["hypernet_kwargs"]["share_TF_output_head"] = True
    batch = make_example_batch(image_size=64)
    rng = jax.random.PRNGKey(21)
    model = HyperVLA.from_config(config, batch, rng)
    # merged head exists; per-layer heads don't
    import re

    head_names = [k for k in model.params if k.startswith("output_head_")]
    assert any(re.search(r"encoderblock_(?!\d)", n) for n in head_names)
    assert not any(re.search(r"encoderblock_\d", n) for n in head_names)

    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}
    generated, _, _ = model.create_tasks(instruction_dict=instr)
    blocks = generated["encoder"]["Transformer_0"]
    for leaf0, leaf1 in zip(
        jax.tree_util.tree_leaves(blocks["encoderblock_0"]),
        jax.tree_util.tree_leaves(blocks["encoderblock_1"]),
    ):
        np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))
