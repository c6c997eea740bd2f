"""Training-runtime tests: optimizer strategies, the single-jit GSPMD train
step on the 8-device virtual mesh, EMA tracking, and loss descent."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.models.hypervla import HyperVLA
from hypervla_tpu.parallel.mesh import create_mesh, replicated, shard_batch
from hypervla_tpu.train.optimizer import (
    create_lr_schedule,
    create_optimizer,
    hn_param_type_tree,
)
from hypervla_tpu.train.train_state import TrainState
from hypervla_tpu.train.train_step import make_train_step

from helpers import make_example_batch

pytestmark = [pytest.mark.slow, pytest.mark.heavy]


def test_lr_schedules():
    rsqrt = create_lr_schedule(
        "rsqrt", init_value=0.0, peak_value=3e-4, warmup_steps=100, timescale=10000
    )
    assert float(rsqrt(0)) == 0.0
    np.testing.assert_allclose(float(rsqrt(100)), 3e-4, rtol=1e-5)
    # decays like 1/sqrt
    np.testing.assert_allclose(
        # join_schedules passes (step - warmup_steps) to the decay branch
        float(rsqrt(30000)), 3e-4 / np.sqrt((29900 + 10000) / 10000), rtol=1e-5
    )
    const = create_lr_schedule(
        "constant", init_value=0.0, peak_value=1e-3, warmup_steps=10
    )
    np.testing.assert_allclose(float(const(1000)), 1e-3, rtol=1e-6)


@pytest.fixture(scope="module")
def trained_setup():
    config = tiny_test_config(encoder_type="SmallStem")
    config["optimizer"]["weight_decay_strategy"] = "v5"
    config["save_param_EMA"] = True
    config["EMA_start_step"] = 1
    batch = make_example_batch(batch_size=8, image_size=64)
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    return config, batch, model


def test_hn_param_type_split(trained_setup):
    config, _, model = trained_setup
    labels = hn_param_type_tree(model.params)
    leaves = set(jax.tree_util.tree_leaves(labels))
    assert leaves == {"generated"}  # SmallStem config shares nothing


def test_train_step_descends_loss(trained_setup):
    config, batch, model = trained_setup
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params,
        hn_param_type_tree(model.params),
        **config["optimizer"],
    )
    state = TrainState.create(
        jax.random.PRNGKey(1), model.params, tx, track_ema=True
    )
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, donate=False
    )

    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    sharded_batch = shard_batch(batch, mesh)
    state = jax.device_put(state, replicated(mesh))

    losses = []
    for _ in range(8):
        state, info = step_fn(state, sharded_batch)
        losses.append(float(info["training_loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    # warmup lr is tiny; just check the loss moved and grads flowed
    assert losses[-1] != losses[0]
    assert float(info["grad_norm"]) > 0.0

    # EMA started at step 1 and differs from params now
    diff = jax.tree_util.tree_map(
        lambda e, p: float(jnp.abs(e - p).max()), state.ema_params, state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0


def test_train_step_with_task_index(trained_setup):
    config, batch, model = trained_setup
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    state = TrainState.create(jax.random.PRNGKey(1), model.params, tx)
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, donate=False
    )
    task_index = {
        "close top drawer": jnp.array([1, 0, 0, 0, 1, 0, 0, 0], dtype=jnp.float32)
    }
    state, info = step_fn(state, batch, task_index)
    assert "task_loss_close top drawer" in info
    assert np.isfinite(float(info["task_loss_close top drawer"]))


def test_train_step_device_augment(trained_setup):
    """dataset_kwargs.device_augment moves the augmentation chain into the
    jitted step; the step must still compile and descend."""
    import copy

    config, batch, model = trained_setup
    config = copy.deepcopy(config)
    config["dataset_kwargs"]["device_augment"] = True
    config["dataset_kwargs"]["image_augment_kwargs"] = {
        "random_resized_crop": {"scale": [0.8, 1.0], "ratio": [0.9, 1.1]},
        "random_brightness": [0.1],
        "augment_order": ["random_resized_crop", "random_brightness"],
    }
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    state = TrainState.create(jax.random.PRNGKey(1), model.params, tx)
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, donate=False
    )
    state, info = step_fn(state, batch)
    assert np.isfinite(float(info["training_loss"]))
    # the host-side pipeline must skip augmentation under device_augment
    from hypervla_tpu.train.trainer import make_train_datasets  # noqa: F401


def test_optimizer_shared_split_uses_base_lr():
    """With a shared image encoder, shared params must follow base_lr."""
    config = tiny_test_config(encoder_type="DINOv2")
    batch = make_example_batch(
        batch_size=2, image_size=224, initial_image=True, initial_patch_dim=32
    )
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    labels = hn_param_type_tree(model.params)
    leaves = set(jax.tree_util.tree_leaves(labels))
    assert leaves == {"generated", "shared"}
    tx, _, _, _ = create_optimizer(
        model.params, labels, **config["optimizer"]
    )
    state = tx.init(model.params)  # must not raise
    assert state is not None


def test_v4_weight_decay_and_delta_decay():
    """Exercises the decoupled-WD gradient (v4) and the delta-decay pull of
    fine-tuned DINO params toward their pretrained values."""
    config = tiny_test_config(encoder_type="DINOv2")
    config["optimizer"]["weight_decay_strategy"] = "v4"
    config["optimizer"]["base_weight_decay"] = 0.1
    config["auxiliary_loss"]["base_weight_decay"] = 0.1
    config["base_net_kwargs"]["vit_kwargs"][
        "fine_tune_pretrained_image_encoder"
    ] = True
    batch = make_example_batch(
        batch_size=2, image_size=224, initial_image=True, initial_patch_dim=32
    )
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params), **config["optimizer"]
    )
    state = TrainState.create(jax.random.PRNGKey(1), model.params, tx)

    # pretrained params for delta-decay: the shared image-encoder blocks
    from hypervla_tpu.models.weight_plan import init_base_net

    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    _, init_params, _, _ = init_base_net(config, example, jax.random.PRNGKey(0))
    pretrained = init_params["encoder"]["image_encoder"]

    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn,
        pretrained_params=pretrained, donate=False,
    )
    state, info = step_fn(state, batch)
    assert np.isfinite(float(info["training_loss"]))
    assert "base_weight_decay_grad_norm" in info
    assert np.isfinite(float(info["base_weight_decay_grad_norm"]))
