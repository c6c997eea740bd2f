"""Hoisted-shared-trunk train step (config["hoist_shared_trunk"]) computes
the same loss and gradients as the vmapped-trunk step."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.flagship import build_flagship, make_flagship_batch
from hypervla_tpu.parallel.mesh import create_mesh, replicated, shard_batch
from hypervla_tpu.train.optimizer import create_optimizer, hn_param_type_tree
from hypervla_tpu.train.train_state import TrainState
from hypervla_tpu.train.train_step import make_train_step

pytestmark = [pytest.mark.slow, pytest.mark.numerics]


def test_hoisted_trunk_matches_vmapped():
    model, _ = build_flagship(tiny=True)
    batch = make_flagship_batch(
        batch_size=8, instr_len=8, action_horizon=2, initial_patch_dim=32
    )
    mesh = create_mesh()

    results = {}
    for hoist in (False, True):
        config = copy.deepcopy(model.config)
        config["hoist_shared_trunk"] = hoist
        tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
            model.params, hn_param_type_tree(model.params),
            **config["optimizer"],
        )
        step_fn = make_train_step(
            model, config, tx, lr_fn, base_lr_fn, pnorm_fn, mesh=mesh,
            donate=False,
        )
        state = TrainState.create(
            jax.random.PRNGKey(0), model.params, tx, track_ema=False
        )
        state = jax.device_put(state, replicated(mesh))
        new_state, info = step_fn(state, shard_batch(batch, mesh))
        results[hoist] = (
            float(info["training_loss"]),
            jax.device_get(new_state.params),
        )

    loss_a, params_a = results[False]
    loss_b, params_b = results[True]
    assert np.isfinite(loss_a) and np.isfinite(loss_b)
    assert abs(loss_a - loss_b) < 1e-5 * (abs(loss_a) + 1e-8)
    flat_a = jax.tree_util.tree_leaves(params_a)
    flat_b = jax.tree_util.tree_leaves(params_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-5, rtol=2e-4,
        )
