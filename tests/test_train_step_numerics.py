"""Numeric pins for the train step's weight-decay variants.

Pins the two behaviors VERDICT flagged as untested:
  * delta-decay of fine-tuned DINO params toward their pretrained values
    (reference: scripts/train.py:464-471) — including the name-coupled
    `updates["encoder_image_encoder_..."]` indexing, which these tests turn
    into a hard failure if the param-tree naming drifts;
  * the v4 decoupled weight-decay gradient (reference:
    scripts/train.py:473-486): a separately-computed, norm-clipped gradient
    of 0.5*||generated kernels||^2, scaled by lr * auxiliary base_weight_decay
    and subtracted from the updates.
"""
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


@pytest.fixture(scope="module")
def flagship_tiny():
    model, _ = build_flagship(tiny=True)
    batch = make_flagship_batch(
        batch_size=8, instr_len=8, action_horizon=2, initial_patch_dim=32
    )
    return model, batch


def _make_step(model, config, tx, lr_fn, base_lr_fn, pnorm_fn, mesh,
               **kwargs):
    return make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, mesh=mesh,
        donate=False, **kwargs,
    )


def _run_one(step_fn, model, tx, batch, mesh, step0=1000):
    state = TrainState.create(
        jax.random.PRNGKey(0), model.params, tx, track_ema=False
    )
    state = state.replace(step=jnp.asarray(step0))
    state = jax.device_put(state, replicated(mesh))
    new_state, info = step_fn(state, shard_batch(batch, mesh))
    return jax.device_get(new_state.params), info


def test_delta_decay_pulls_dino_params_toward_pretrained(flagship_tiny):
    model, batch = flagship_tiny
    config = copy.deepcopy(model.config)
    config["base_net_kwargs"]["vit_kwargs"][
        "fine_tune_pretrained_image_encoder"
    ] = True
    bwd = 0.25
    config["optimizer"]["base_weight_decay"] = bwd

    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params),
        **config["optimizer"],
    )
    mesh = create_mesh()

    block = "encoder_image_encoder_embeddings_cls_token"
    assert block in model.params, "expected the DINO cls token HN block"
    rng = np.random.RandomState(0)
    pretrained_leaf = rng.randn(model.params[block].size).astype(np.float32)
    # a partial pretrained tree: paths join to the HN block name
    pretrained = {"embeddings": {"cls_token": jnp.asarray(pretrained_leaf)}}

    step_plain = _make_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, mesh
    )
    step_decay = _make_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, mesh,
        pretrained_params=pretrained,
    )

    step0 = 1000
    params_plain, _ = _run_one(step_plain, model, tx, batch, mesh, step0)
    params_decay, _ = _run_one(step_decay, model, tx, batch, mesh, step0)

    coefficient = float(base_lr_fn(step0)) * bwd
    assert coefficient > 0, "schedule must be past warmup for a sharp test"

    got = params_decay[block] - params_plain[block]
    np.testing.assert_allclose(
        got, coefficient * pretrained_leaf, rtol=2e-4, atol=1e-6
    )
    # every other leaf is untouched (params may contain nested subtrees)
    flat_plain = jax.tree_util.tree_leaves_with_path(params_plain)
    flat_decay = dict(jax.tree_util.tree_leaves_with_path(params_decay))
    for path, leaf in flat_plain:
        if jax.tree_util.keystr(path) == f"['{block}']":
            continue
        np.testing.assert_array_equal(leaf, flat_decay[path])


def test_v4_weight_decay_update_norm_and_direction(flagship_tiny):
    model, batch = flagship_tiny
    config_v4 = copy.deepcopy(model.config)
    config_v4["optimizer"]["weight_decay_strategy"] = "v4"
    aux_bwd = 0.5
    config_v4["auxiliary_loss"]["base_weight_decay"] = aux_bwd
    clip = config_v4["optimizer"]["clip_gradient"]

    # one optimizer shared by both steps isolates exactly the v4 term
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params),
        **config_v4["optimizer"],
    )
    config_off = copy.deepcopy(config_v4)
    config_off["optimizer"]["weight_decay_strategy"] = "v5"

    mesh = create_mesh()
    step_v4 = _make_step(
        model, config_v4, tx, lr_fn, base_lr_fn, pnorm_fn, mesh
    )
    step_off = _make_step(
        model, config_off, tx, lr_fn, base_lr_fn, pnorm_fn, mesh
    )

    step0 = 1000
    params_v4, info_v4 = _run_one(step_v4, model, tx, batch, mesh, step0)
    params_off, _ = _run_one(step_off, model, tx, batch, mesh, step0)

    assert "base_weight_decay_grad_norm" in info_v4
    wd_grad_norm = float(info_v4["base_weight_decay_grad_norm"])
    assert np.isfinite(wd_grad_norm) and wd_grad_norm > 0

    # params_v4 - params_off == -coeff * wd_updates,
    # where ||wd_updates|| == min(wd_grad_norm, clip)
    coeff = float(lr_fn(step0)) * aux_bwd
    delta = jax.tree_util.tree_map(
        lambda a, b: a - b, params_v4, params_off
    )
    delta_norm = float(
        jnp.sqrt(
            sum((d.astype(jnp.float64) ** 2).sum()
                for d in jax.tree_util.tree_leaves(delta))
        )
    )
    expected = coeff * min(wd_grad_norm, clip)
    np.testing.assert_allclose(delta_norm, expected, rtol=5e-4)

    # the decay direction must actually touch the params (non-degenerate)
    assert delta_norm > 0


def test_packed_optimizer_matches_per_leaf(flagship_tiny):
    """optimizer.packed=True groups leaves into flat buffers; its updates
    must be numerically identical to the per-leaf multi_transform AdamW."""
    model, _ = flagship_tiny
    cfg = dict(copy.deepcopy(model.config)["optimizer"])
    labels = hn_param_type_tree(model.params)
    tx_ref, *_ = create_optimizer(model.params, labels, **cfg)
    tx_packed, *_ = create_optimizer(
        model.params, labels, **dict(cfg, packed=True)
    )

    rng = np.random.RandomState(0)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), p.dtype) * 1e-3,
        model.params,
    )
    updates_ref, _ = tx_ref.update(
        grads, tx_ref.init(model.params), model.params
    )
    updates_packed, _ = tx_packed.update(
        grads, tx_packed.init(model.params), model.params
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(updates_ref),
        jax.tree_util.tree_leaves(updates_packed),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
