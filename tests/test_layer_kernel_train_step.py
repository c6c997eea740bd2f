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


def _batch():
    return make_flagship_batch(
        batch_size=8, instr_len=8, action_horizon=2,
        initial_patch_dim=32,
    )


def _step_once(model, params):
    config = copy.deepcopy(model.config)
    config["hoist_shared_trunk"] = True
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn,
        mesh=create_mesh(), donate=False,
    )
    state = TrainState.create(jax.random.PRNGKey(0), params, tx,
                              track_ema=False)
    state = jax.device_put(state, replicated(create_mesh()))
    new_state, info = step_fn(state, shard_batch(_batch(), create_mesh()))
    return float(info["training_loss"]), jax.device_get(new_state.params)


def test_layer_kernel_step_same_params_loss_parity():
    """Both step functions on the SAME param tree (the kernel path's pytree
    params are layout-identical): loss to bf16 tolerance, post-AdamW-update
    param cosine per leaf."""
    model_ref, _ = build_flagship(
        tiny=True, encoder_dtype="bfloat16", vit_overrides=dict(_WIDE)
    )
    model_ker, _ = build_flagship(
        tiny=True, encoder_dtype="bfloat16",
        vit_overrides=dict(_WIDE, dino_layers_impl="pallas_train"),
    )
    loss_ref, params_ref = _step_once(model_ref, model_ref.params)
    loss_ker, params_ker = _step_once(model_ker, model_ref.params)

    assert np.isfinite(loss_ref) and np.isfinite(loss_ker)
    assert abs(loss_ref - loss_ker) < 0.02 * (abs(loss_ref) + 1e-8), (
        loss_ref, loss_ker,
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params_ref)[0],
        jax.tree_util.tree_flatten_with_path(params_ker)[0],
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
