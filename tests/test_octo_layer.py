"""Tests for the octo model layer: BlockTransformer attention rules, the
OctoTransformer base network, EfficientNet, and the BaseModel ablation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.models.block_transformer import (
    AttentionRule,
    BlockTransformer,
    PrefixGroup,
    TimestepGroup,
)

pytestmark = [pytest.mark.slow, pytest.mark.parity]

TRANSFORMER_KWARGS = dict(
    num_layers=1, mlp_dim=32, num_attention_heads=2,
    dropout_rate=0.0, attention_dropout_rate=0.0,
)


def _groups(batch=2, horizon=3, d=16):
    prefix = PrefixGroup(
        tokens=jnp.ones((batch, 2, d)),
        mask=jnp.ones((batch, 2), dtype=bool),
        name="task_language",
        attention_rules={"task_*": AttentionRule.CAUSAL},
    )
    obs = TimestepGroup(
        tokens=jnp.ones((batch, horizon, 4, d)),
        mask=jnp.ones((batch, horizon, 4), dtype=bool),
        name="obs_primary",
        attention_rules={
            "task_*": AttentionRule.CAUSAL,
            "obs_*": AttentionRule.CAUSAL,
        },
    )
    readout = TimestepGroup(
        tokens=jnp.zeros((batch, horizon, 1, d)),
        mask=jnp.ones((batch, horizon, 1), dtype=bool),
        name="readout_action",
        attention_rules={
            "task_*": AttentionRule.CAUSAL,
            "obs_*": AttentionRule.CAUSAL,
            "readout_action": AttentionRule.CAUSAL,
        },
    )
    return prefix, obs, readout


def test_block_transformer_mask_structure():
    prefix, obs, readout = _groups()
    bt = BlockTransformer(TRANSFORMER_KWARGS)
    mask = bt.generate_attention_mask([prefix], [obs, readout])
    mask = np.asarray(mask[0, 0])
    # layout: [task(2)] + per-timestep [obs(4), readout(1)] * 3
    n_task, per_step = 2, 5
    # obs at t=0 attends to task
    assert mask[n_task, 0]
    # obs at t=0 does NOT attend to readout at t=0
    assert not mask[n_task, n_task + 4]
    # readout at t=0 attends to obs at t=0
    assert mask[n_task + 4, n_task]
    # obs at t=0 does NOT attend to obs at t=1 (future)
    assert not mask[n_task, n_task + per_step]
    # obs at t=1 attends to obs at t=0 (past)
    assert mask[n_task + per_step, n_task]
    # task does not attend to observations
    assert not mask[0, n_task]


def test_block_transformer_forward_split():
    prefix, obs, readout = _groups()
    bt = BlockTransformer(TRANSFORMER_KWARGS)
    params = bt.init(
        jax.random.PRNGKey(0), [prefix], [obs, readout], train=False
    )
    prefix_out, timestep_out = bt.apply(
        params, [prefix], [obs, readout], train=False
    )
    assert prefix_out[0].tokens.shape == (2, 2, 16)
    assert timestep_out[0].tokens.shape == (2, 3, 4, 16)
    assert timestep_out[1].tokens.shape == (2, 3, 1, 16)


def test_block_transformer_causality_enforced():
    prefix, obs, readout = _groups()
    # note: the check keys on exact group names (parity with the reference's
    # verify_causality, block_transformer.py:386-390)
    bad_prefix = prefix.replace(
        attention_rules={"obs_primary": AttentionRule.CAUSAL}
    )
    bt = BlockTransformer(TRANSFORMER_KWARGS)
    with pytest.raises(AssertionError):
        bt.generate_attention_mask([bad_prefix], [obs, readout])


def test_octo_transformer_base_net():
    from hypervla_tpu.models.base_octo import OctoTransformer

    model = OctoTransformer(
        observation_tokenizers={},
        readouts={"action": 1},
        transformer_kwargs=dict(**TRANSFORMER_KWARGS, learnable_norm=True),
        token_embedding_size=16,
        max_horizon=4,
        repeat_task_tokens=True,
        use_correct_attention=True,
        use_pretrained_image_tokenizer=True,
    )
    batch, horizon = 2, 2
    observations = {
        "image_patches": {
            "token": jnp.ones((batch, horizon, 6, 8)),
            "mask": jnp.ones((batch, horizon, 6), dtype=bool),
        }
    }
    tasks = {
        "language_instruction": {
            "token_embedding": jnp.ones((batch, 5, 12))
        },
        "pad_mask_dict": {
            "language_instruction": jnp.ones((batch,), dtype=bool)
        },
    }
    pad_mask = jnp.ones((batch, horizon), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), observations, tasks, pad_mask)
    out = model.apply(params, observations, tasks, pad_mask)
    assert out["readout_action"].tokens.shape == (batch, horizon, 1, 16)
    assert out["task"].tokens.shape == (batch, 5, 16)
    assert "obs" in out


def test_efficientnet_forward():
    from hypervla_tpu.models.efficientnet import MODEL_CONFIGS, EfficientNet

    # a tiny custom config to keep the CPU test fast
    from hypervla_tpu.models.efficientnet import BlockConfig, ModelConfig

    tiny = ModelConfig(
        1.0, 1.0, 64, 0.2,
        blocks=(
            BlockConfig(8, 8, 3, 1, 1, (1, 1), 0.25),
            BlockConfig(8, 16, 3, 1, 6, (2, 2), 0.25),
        ),
        stem_base_filters=8,
        top_base_filters=32,
    )
    model = EfficientNet(config=tiny)
    x = jnp.ones((1, 64, 64, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "drop_connect": jax.random.PRNGKey(1)},
        x, train=False,
    )
    out = model.apply(
        params, x, train=False, rngs={"drop_connect": jax.random.PRNGKey(2)}
    )
    assert out.shape[0] == 1 and out.shape[-1] == 32
    assert "efficientnet-b3" in MODEL_CONFIGS


def test_base_model_ablation_roundtrip(tmp_path):
    from hypervla_tpu.configs import tiny_test_config
    from hypervla_tpu.models.base_model import BaseModel

    from helpers import make_example_batch

    config = tiny_test_config(encoder_type="SmallStem")
    batch = make_example_batch(image_size=64)
    model = BaseModel.from_config(config, batch, jax.random.PRNGKey(0))
    params, _, _ = model.create_tasks(instruction_dict=None)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    action, _ = model.sample_actions(
        example["observation"]["image_primary"],
        {"language_instruction": example["task"]["language_instruction"]},
        None,
        example["observation"]["timestep_pad_mask"],
        params,
        rng=jax.random.PRNGKey(1),
    )
    assert action.shape == (1, 2, 7)

    ckpt = str(tmp_path / "base_model")
    model.save_pretrained(step=5, checkpoint_path=ckpt)
    loaded = BaseModel.load_pretrained(ckpt)
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(loaded.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
