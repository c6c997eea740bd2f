"""Unit tests for action heads, including golden-value checks of the loss
semantics (masked_mean scaling, mix-head gripper decode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.models.action_heads import (
    ContinuousActionHead,
    DiffusionActionHead,
    DiscreteActionHead,
    MixActionHead,
    binary_loss,
    continuous_loss,
    masked_mean,
)
from hypervla_tpu.models.token_group import TokenGroup

pytestmark = pytest.mark.slow


def _outputs(batch=2, window=1, tokens=1, dim=16, key=0):
    emb = jax.random.normal(jax.random.PRNGKey(key), (batch, window, tokens, dim))
    return {"readout_action": TokenGroup(emb, None)}


def test_masked_mean_golden():
    x = jnp.array([1.0, 2.0, 3.0, 4.0])
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    # mean(x*mask)=0.75, mean(mask)=0.5 -> 1.5
    np.testing.assert_allclose(masked_mean(x, mask), 1.5, atol=1e-6)


def test_continuous_loss_golden():
    pred = jnp.array([1.0, 0.0])
    target = jnp.array([0.0, 0.0])
    mask = jnp.array([1.0, 1.0])
    loss, metrics = continuous_loss(pred, target, mask, "mse")
    np.testing.assert_allclose(loss, 0.5, atol=1e-6)
    loss_l1, _ = continuous_loss(pred, target, mask, "l1")
    np.testing.assert_allclose(loss_l1, 0.5, atol=1e-6)


def test_binary_loss_golden():
    logits = jnp.array([0.0])
    target = jnp.array([1.0])
    mask = jnp.array([1.0])
    loss, _ = binary_loss(logits, target, mask)
    np.testing.assert_allclose(loss, np.log(2.0), atol=1e-5)


def test_mix_head_predict_gripper_threshold():
    head = MixActionHead(readout_key="readout_action", action_horizon=4,
                         action_dim=7, token_per_horizon=False)
    outs = _outputs()
    params = head.init(jax.random.PRNGKey(0), outs, train=False)
    action = head.apply(params, outs, train=False,
                        method=MixActionHead.predict_action)
    assert action.shape == (2, 4, 7)
    cont, logits = head.apply(params, outs, train=False)
    # continuous dims squashed to [-5, 5]
    assert np.abs(np.asarray(cont)).max() <= 5.0
    # gripper decode is exactly (logit >= 0)
    np.testing.assert_array_equal(
        np.asarray(action[..., -1]), np.asarray(logits[:, -1, :, 0] >= 0.0)
    )


def test_mix_head_loss_components():
    head = MixActionHead(readout_key="readout_action", action_horizon=2,
                         action_dim=7, clip_target=True)
    outs = _outputs(window=1)
    actions = jnp.ones((2, 1, 2, 7))
    timestep_pad = jnp.ones((2, 1), dtype=bool)
    action_pad = jnp.ones((2, 1, 2, 7), dtype=bool)
    params = head.init(jax.random.PRNGKey(0), outs, train=False)
    loss, metrics = head.apply(
        params, outs, actions, timestep_pad, action_pad, train=False,
        method=MixActionHead.loss,
    )
    np.testing.assert_allclose(
        loss, metrics["continuous_loss"] + metrics["gripper_loss"], atol=1e-6
    )


def test_continuous_head_loss_is_sum_over_dims():
    head = ContinuousActionHead(readout_key="readout_action", action_horizon=1,
                                action_dim=3, squash_continuous_action=False)
    outs = _outputs(tokens=1, dim=8)
    params = head.init(jax.random.PRNGKey(0), outs, train=False)
    mean = head.apply(params, outs, train=False)
    actions = mean + 1.0  # uniform error of 1 -> mse per-elem 1 -> loss = dim
    loss, metrics = head.apply(
        params, outs, actions,
        jnp.ones((2, 1), dtype=bool), jnp.ones((2, 1, 1, 3), dtype=bool),
        train=False, method=ContinuousActionHead.loss,
    )
    np.testing.assert_allclose(loss, 3.0, atol=1e-5)


def test_discrete_head_roundtrip():
    head = DiscreteActionHead(readout_key="readout_action", action_horizon=2,
                              action_dim=3, vocab_size=32)
    outs = _outputs(tokens=6, dim=8)
    params = head.init(jax.random.PRNGKey(0), outs, train=False)
    action = head.apply(params, outs, train=False, argmax=True,
                        method=DiscreteActionHead.predict_action)
    assert action.shape == (2, 2, 3)
    assert np.abs(np.asarray(action)).max() <= 1.0  # decoded bin centers


def test_diffusion_head_loss_and_sampling():
    head = DiffusionActionHead(readout_key="readout_action", action_horizon=2,
                               action_dim=3, diffusion_steps=4, num_blocks=1,
                               hidden_dim=16, time_dim=4)
    outs = _outputs(tokens=1, dim=8)
    actions = jnp.zeros((2, 1, 2, 3))
    params = head.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        outs, train=False,
    )
    loss, metrics = head.apply(
        params, outs, actions, jnp.ones((2, 1), dtype=bool),
        jnp.ones((2, 1, 2, 3), dtype=bool),
        train=False, method=DiffusionActionHead.loss,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(loss))
    sample = head.apply(
        params, outs, jax.random.PRNGKey(3), train=False,
        method=DiffusionActionHead.predict_action,
    )
    assert sample.shape == (2, 2, 3)
    assert np.abs(np.asarray(sample)).max() <= head.max_action + 1e-6
