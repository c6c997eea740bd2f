"""Integration: the full-layer Pallas trunk (dino_layers_impl=
"pallas_train") inside the real GSPMD train step — hoisted trunk, frozen
conditioning encoder on the no-residual forward, weight grads through the
kernel's custom VJP — against the standard bf16 einsum trunk at the same
params. CPU interpret mode; the smallest kernel-compatible geometry
(dinov2-test-wide: 128 wide, 2 heads)."""
import copy

import jax
import numpy as np
import pytest

from hypervla_tpu.flagship import build_flagship, make_flagship_batch
from hypervla_tpu.parallel.mesh import create_mesh, replicated, shard_batch
from hypervla_tpu.train.optimizer import create_optimizer, hn_param_type_tree
from hypervla_tpu.train.train_state import TrainState
from hypervla_tpu.train.train_step import make_train_step

pytestmark = [pytest.mark.slow, pytest.mark.numerics]

_WIDE = {
    "pretrained_encoder_name": "dinov2-test-wide",
    "sow_dino_attention": False,
}


def _run_step(layer_kernel: bool):
    model, _ = build_flagship(
        tiny=True, encoder_dtype="bfloat16",
        vit_overrides=dict(
            _WIDE,
            dino_layers_impl="pallas_train" if layer_kernel else None,
        ),
    )
    batch = make_flagship_batch(
        batch_size=8, instr_len=8, action_horizon=2, initial_patch_dim=32
    )
    config = copy.deepcopy(model.config)
    config["hoist_shared_trunk"] = True
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn,
        mesh=create_mesh(), donate=False,
    )
    state = TrainState.create(
        jax.random.PRNGKey(0), model.params, tx, track_ema=False
    )
    state = jax.device_put(state, replicated(create_mesh()))
    new_state, info = step_fn(state, shard_batch(batch, create_mesh()))
    return model, float(info["training_loss"]), new_state


def test_layer_kernel_step_matches_einsum_trunk():
    model_a, loss_ref, state_ref = _run_step(layer_kernel=False)
    model_b, loss_ker, state_ker = _run_step(layer_kernel=True)
    # identical init: the kernel path's pytree params are layout-identical,
    # but init VALUES may differ (different rng folding) — so compare the
    # param trees first and bail to structure-only if they differ
    assert np.isfinite(loss_ref) and np.isfinite(loss_ker)
    same_init = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(model_a.params)),
            jax.tree_util.tree_leaves(jax.device_get(model_b.params)),
        )
    )
    if same_init:
        # bf16 trunks with different-but-equivalent kernels: loss agrees to
        # bf16 tolerance
        assert abs(loss_ref - loss_ker) < 0.02 * (abs(loss_ref) + 1e-8), (
            loss_ref, loss_ker,
        )


def test_layer_kernel_step_same_params_loss_parity():
    """Run BOTH step functions on the SAME param tree (kernel-path model
    re-applied over the reference model's params) — the strict parity
    check, independent of init rng folding."""
    model_ref, _, _ = _run_step(layer_kernel=False)

    model_ker, _ = build_flagship(
        tiny=True, encoder_dtype="bfloat16",
        vit_overrides=dict(_WIDE, dino_layers_impl="pallas_train"),
    )
    batch = make_flagship_batch(
        batch_size=8, instr_len=8, action_horizon=2, initial_patch_dim=32
    )
    losses = {}
    grads = {}
    for name, model in (("ref", model_ref), ("ker", model_ker)):
        config = copy.deepcopy(model.config)
        config["hoist_shared_trunk"] = True
        tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
            model.params, hn_param_type_tree(model.params),
            **config["optimizer"],
        )
        step_fn = make_train_step(
            model, config, tx, lr_fn, base_lr_fn, pnorm_fn,
            mesh=create_mesh(), donate=False,
        )
        # SAME params for both paths
        state = TrainState.create(
            jax.random.PRNGKey(0), model_ref.params, tx, track_ema=False
        )
        state = jax.device_put(state, replicated(create_mesh()))
        new_state, info = step_fn(state, shard_batch(batch, create_mesh()))
        losses[name] = float(info["training_loss"])
        grads[name] = jax.device_get(new_state.params)

    assert np.isfinite(losses["ref"]) and np.isfinite(losses["ker"])
    assert abs(losses["ref"] - losses["ker"]) < 0.02 * (
        abs(losses["ref"]) + 1e-8
    ), losses
    # post-update params: same AdamW step off bf16-equivalent grads
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(grads["ref"])[0],
        jax.tree_util.tree_flatten_with_path(grads["ker"])[0],
    ):
        af = np.asarray(a, np.float32).ravel()
        bf = np.asarray(b, np.float32).ravel()
        n = np.linalg.norm(af) * np.linalg.norm(bf)
        cos = float(af @ bf / n) if n else 1.0
        assert cos > 0.98, (jax.tree_util.keystr(path), cos)


def test_layer_kernel_requires_hoisted_trunk():
    model, _ = build_flagship(
        tiny=True, encoder_dtype="bfloat16",
        vit_overrides=dict(_WIDE, dino_layers_impl="pallas_train"),
    )
    config = copy.deepcopy(model.config)
    config["hoist_shared_trunk"] = False
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    with pytest.raises(ValueError, match="hoist"):
        make_train_step(
            model, config, tx, lr_fn, base_lr_fn, pnorm_fn,
            mesh=create_mesh(), donate=False,
        )
