"""Bit-match parity against the ACTUAL reference implementation.

The goldens in tests/goldens/reference_parity/<case>/ were produced by
RUNNING the reference repo's HyperVLA (it is also JAX/Flax — see
scripts/gen_reference_goldens.py) on each config + batch: its hypernet
params, the base params it generated, and the action it sampled. Loading its
params into OUR model must reproduce both the generated weights and the
sampled actions within 1e-5 (BASELINE.json north star).

Cases: `base` (bias-init protocol: context-independent generation at step 0),
`perturbed` (random fan-out kernels -> context-DEPENDENT generation:
exercises the context encoder, attention masks, packed fan-out math),
`initial_image` (initial-image conditioning + scaled context embeddings),
`continuous_head` (tanh-squashed continuous action head)."""
import os

import jax
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]

GOLDEN_DIR = os.path.join(
    os.path.dirname(__file__), "goldens", "reference_parity"
)
CASES = (
    sorted(os.listdir(GOLDEN_DIR)) if os.path.isdir(GOLDEN_DIR) else []
)

CASE_CONFIG = {
    "base": dict(),
    "perturbed": dict(),
    "initial_image": dict(
        hypernet_kwargs=dict(use_initial_image=True,
                             scale_context_embedding=True)
    ),
    "dinov2_shared": dict(encoder_type="DINOv2"),
    "continuous_head": dict(action_head_type="continuous"),
}
CASE_BATCH = {
    "initial_image": dict(
        initial_image=True, initial_patch_tokens=17, initial_patch_dim=32
    ),
    "dinov2_shared": dict(
        image_size=224, initial_image=True, initial_patch_dim=32
    ),
}


def _load_golden(case):
    import flax.serialization

    d = os.path.join(GOLDEN_DIR, case)

    def load(name):
        with open(os.path.join(d, name), "rb") as f:
            return flax.serialization.msgpack_restore(f.read())

    return {
        "hypernet_params": load("hypernet_params.msgpack"),
        "generated_base_params": load("generated_base_params.msgpack"),
        "io": dict(np.load(os.path.join(d, "io.npz"))),
    }


def _build(case, golden):
    from helpers import make_example_batch

    from hypervla_tpu.configs import tiny_test_config
    from hypervla_tpu.models.hypervla import HyperVLA
    from hypervla_tpu.utils.convert import convert_reference_params

    config_kwargs = dict(CASE_CONFIG[case])
    encoder_type = config_kwargs.pop("encoder_type", "SmallStem")
    config = tiny_test_config(encoder_type=encoder_type, **config_kwargs)
    if case == "continuous_head":
        config["base_net_kwargs"]["action_head_kwargs"] = {
            k: v
            for k, v in config["base_net_kwargs"]["action_head_kwargs"].items()
            if k in (
                "max_action", "loss_type", "token_per_horizon",
                "squash_continuous_action", "tanh_scaling_factor",
                "clip_target",
            )
        }
    batch_kwargs = dict({"image_size": 64}, **CASE_BATCH.get(case, {}))
    batch = make_example_batch(batch_size=2, **batch_kwargs)
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    ref_params = convert_reference_params(golden["hypernet_params"])
    assert jax.tree_util.tree_structure(
        ref_params
    ) == jax.tree_util.tree_structure(model.params)
    return model.replace(params=ref_params)


def _instruction(io):
    return {
        "language_instruction": {
            "input_ids": io["input_ids"],
            "attention_mask": io["attention_mask"],
            "token_embedding": io["token_embedding"],
        }
    }


def _initial_state(io):
    if "initial_patch_embeddings" not in io:
        return None
    return {
        "image_primary": io["initial_image"],
        "patch_embeddings": io["initial_patch_embeddings"],
    }


@pytest.mark.parametrize("case", CASES)
def test_generated_weights_and_actions_match_reference(case):
    from hypervla_tpu.utils.convert import convert_reference_params

    golden = _load_golden(case)
    model = _build(case, golden)
    io = golden["io"]
    instr = _instruction(io)

    base_params, tasks, _ = model.create_tasks(
        instruction_dict=instr, initial_state=_initial_state(io)
    )
    ref_gen = convert_reference_params(golden["generated_base_params"])
    flat_ref = dict(
        ("/".join(str(k.key) for k in p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_gen)[0]
    )
    flat_ours = jax.tree_util.tree_flatten_with_path(base_params)[0]
    assert len(flat_ours) == len(flat_ref)
    for path, ours in flat_ours:
        name = "/".join(str(k.key) for k in path)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(flat_ref[name]), atol=1e-5,
            err_msg=f"{case}: {name}",
        )

    action, _ = model.sample_actions(
        io["image"], instr, tasks, io["pad_mask"], base_params,
        rng=jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(
        np.asarray(action), io["action"], atol=1e-5, err_msg=case
    )
