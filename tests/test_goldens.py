"""Golden-value regression tests.

Freezes the numerics of the seed-fixed tiny model: generated base-net params
and sampled actions. Any refactor that changes these values changes training/
inference behavior and must be deliberate (regenerate with
`REGENERATE_GOLDENS=1 pytest tests/test_goldens.py`).
"""
import json
import os

import jax
import numpy as np
import pytest

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.models.hypervla import HyperVLA

from helpers import make_example_batch

pytestmark = [pytest.mark.slow, pytest.mark.parity]

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "tiny_smallstem.json")


def _compute_goldens():
    config = tiny_test_config(encoder_type="SmallStem")
    batch = make_example_batch(image_size=64)
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(1234))
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}
    base_params, tasks, _ = model.create_tasks(instruction_dict=instr)
    action, _ = model.sample_actions(
        example["observation"]["image_primary"],
        instr,
        tasks,
        example["observation"]["timestep_pad_mask"],
        base_params,
        rng=jax.random.PRNGKey(5678),
    )
    leaves = jax.tree_util.tree_leaves(base_params)
    return {
        "param_leaf_count": len(leaves),
        "param_abs_sum": float(
            np.sum([np.abs(np.asarray(l)).sum() for l in leaves])
        ),
        "param_first_leaf": np.asarray(leaves[0]).reshape(-1)[:8].tolist(),
        "action": np.asarray(action).reshape(-1).tolist(),
    }


def test_golden_values():
    got = _compute_goldens()
    if os.environ.get("REGENERATE_GOLDENS") or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1)
        pytest.skip("goldens (re)generated")
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    assert got["param_leaf_count"] == want["param_leaf_count"]
    np.testing.assert_allclose(
        got["param_abs_sum"], want["param_abs_sum"], rtol=1e-5
    )
    np.testing.assert_allclose(
        got["param_first_leaf"], want["param_first_leaf"], atol=1e-6
    )
    np.testing.assert_allclose(got["action"], want["action"], atol=1e-5)
