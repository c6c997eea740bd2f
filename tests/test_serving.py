"""Fused serving-step tests: matches the InferenceWrapper's host-side
pipeline (unnormalize + ensemble) step for step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.eval.action_ensemble import ActionEnsembler
from hypervla_tpu.models.hypervla import HyperVLA
from hypervla_tpu.ops.serving import make_serving_step

from helpers import make_example_batch

pytestmark = pytest.mark.slow


def test_serving_step_matches_host_pipeline():
    config = tiny_test_config(encoder_type="SmallStem")
    batch = make_example_batch(image_size=64)
    stats = {
        "mean": np.arange(7, dtype=np.float32) / 10,
        "std": 1 + np.arange(7, dtype=np.float32) / 7,
        "mask": np.array([True] * 6 + [False]),
    }
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}
    base_params, tasks, _ = model.create_tasks(instruction_dict=instr)

    step_fn, init_history = make_serving_step(
        model, stats, normalization_type="normal", image_size=64, crop=False
    )
    history = init_history()
    ensembler = ActionEnsembler(pred_action_horizon=2)
    rng = jax.random.PRNGKey(1)
    frames = np.random.RandomState(0).randint(
        0, 255, (3, 64, 64, 3)
    ).astype(np.uint8)

    for t, frame in enumerate(frames):
        action, history = step_fn(
            base_params,
            frame,
            instr["language_instruction"]["token_embedding"],
            history,
            t,
            rng,
        )
        # host reference: raw prediction -> unnormalize -> ensemble
        raw, _ = model.sample_actions(
            frame[None, None],
            instr,
            tasks,
            np.ones((1, 1)),
            base_params,
            rng=rng,
        )
        raw = np.asarray(raw[0])
        unnorm = np.where(
            stats["mask"], raw * stats["std"] + stats["mean"], raw
        )
        expected = ensembler.ensemble_action(unnorm)
        np.testing.assert_allclose(np.asarray(action), expected, atol=1e-5)


def test_inference_wrapper_fused_matches_host_path():
    """fused_serving=True must produce the same actions as the host path."""
    from hypervla_tpu.eval.inference import InferenceWrapper

    config = tiny_test_config(encoder_type="SmallStem")
    config["dataset_kwargs"]["dataset_kwargs"] = {
        "action_proprio_normalization_type": "normal"
    }
    batch = make_example_batch(image_size=64)
    stats = {
        "action": {
            "mean": np.zeros(7, np.float32),
            "std": np.ones(7, np.float32),
            "mask": np.array([True] * 6 + [False]),
        }
    }
    model = HyperVLA.from_config(
        config, batch, jax.random.PRNGKey(0), dataset_statistics=stats
    )
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}

    kwargs = dict(
        model=model, policy_setup="libero", horizon=1, pred_action_horizon=2,
        image_size=64, action_ensemble=True, crop=False,
    )
    host = InferenceWrapper(**kwargs)
    fused = InferenceWrapper(**kwargs, fused_serving=True)
    assert fused.fused_serving

    frames = np.random.RandomState(3).randint(
        0, 255, (3, 64, 64, 3)
    ).astype(np.uint8)
    host.reset("do the thing", instr)
    fused.reset("do the thing", instr)
    for t, frame in enumerate(frames):
        raw_h, act_h, _, _, _ = host.step(frame)
        raw_f, act_f, _, _, _ = fused.step(frame)
        np.testing.assert_allclose(raw_f, raw_h, atol=1e-4)
        np.testing.assert_allclose(act_f, act_h, atol=1e-4)


def test_multitask_serving_matches_single_task():
    """N different tasks served in one vmapped program must produce the
    same actions as N single-task steps (shared trunk unbatched)."""
    import jax
    import jax.numpy as jnp

    from hypervla_tpu.flagship import build_flagship, make_flagship_batch
    from hypervla_tpu.ops.serving import (
        make_multitask_serving_step,
        make_serving_step,
    )

    model, _ = build_flagship(tiny=True)
    stats = {"mean": np.zeros(7), "std": np.ones(7)}

    # two different instructions -> two different generated policies
    per_task_params = []
    token_embeddings = []
    for seed in (0, 1):
        batch = make_flagship_batch(
            batch_size=1, instr_len=8, action_horizon=2,
            initial_patch_dim=32, seed=seed,
        )
        instr = {
            "language_instruction": batch["task"]["language_instruction"]
        }
        base_params, _, _ = model.create_tasks(
            instruction_dict=instr, initial_state=batch["initial_state"]
        )
        per_task_params.append(base_params)
        token_embeddings.append(
            jnp.asarray(
                batch["task"]["language_instruction"]["token_embedding"]
            )
        )

    single, init_history = make_serving_step(
        model, stats, image_size=224, crop=False, ensemble=False
    )
    multi, multi_init, stack = make_multitask_serving_step(
        model, stats, image_size=224, crop=False, ensemble=False
    )

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.randint(0, 255, (2, 224, 224, 3)).astype(np.uint8)
    )
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    histories = jnp.stack([init_history()] * 2)
    step_idx = jnp.zeros(2, jnp.int32)

    stacked = stack(per_task_params)
    actions_multi, _ = multi(
        stacked, frames, jnp.concatenate(token_embeddings), histories,
        step_idx, rngs,
    )

    for t in range(2):
        action_single, _ = single(
            per_task_params[t], frames[t], token_embeddings[t],
            init_history(), jnp.int32(0), rngs[t],
        )
        np.testing.assert_allclose(
            np.asarray(actions_multi[t]), np.asarray(action_single),
            atol=1e-5,
        )


def test_prepare_serving_params_preserves_actions():
    """The once-per-episode param preparation (pos-grid bake; bf16 trunk cast
    on bf16 configs) leaves a fp32 model's actions bit-identical."""
    from hypervla_tpu.flagship import build_flagship, make_flagship_batch
    from hypervla_tpu.models.base_network import BaseNetwork
    from hypervla_tpu.ops.serving import prepare_serving_params

    model, batch = build_flagship(tiny=True)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    base_params, tasks, _ = model.create_tasks(
        instruction_dict={
            "language_instruction": example["task"]["language_instruction"]
        },
        initial_state=example["initial_state"],
    )
    rng = jax.random.PRNGKey(0)

    def act(params):
        return model.base_net.apply(
            {"params": params},
            example["observation"]["image_primary"].squeeze(1),
            example["task"]["language_instruction"]["token_embedding"],
            example["observation"]["timestep_pad_mask"],
            rng=rng,
            rngs={"dropout": rng},
            train=False,
            method=BaseNetwork.predict_action,
        )

    a_ref = np.asarray(act(base_params))
    prepared = prepare_serving_params(model, base_params, image_size=224)
    a_prep = np.asarray(act(prepared))
    np.testing.assert_array_equal(a_ref, a_prep)


def test_pack_generated_params_roundtrip():
    """Packing the generated leaves into one buffer and unpacking inside a
    jit reproduces the exact action outputs with far fewer argument leaves."""
    from hypervla_tpu.flagship import build_flagship, make_flagship_batch
    from hypervla_tpu.models.base_network import BaseNetwork
    from hypervla_tpu.ops.serving import pack_generated_params

    model, batch = build_flagship(tiny=True)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    base_params, tasks, _ = model.create_tasks(
        instruction_dict={
            "language_instruction": example["task"]["language_instruction"]
        },
        initial_state=example["initial_state"],
    )
    packed, shared, unpack = pack_generated_params(model, base_params)
    assert packed.ndim == 1 and packed.dtype == jnp.float32
    n_before = len(jax.tree_util.tree_leaves(base_params))
    assert 1 + len(shared) < n_before

    rng = jax.random.PRNGKey(0)
    images = example["observation"]["image_primary"].squeeze(1)
    emb = example["task"]["language_instruction"]["token_embedding"]
    mask = example["observation"]["timestep_pad_mask"]

    def act(params):
        return model.base_net.apply(
            {"params": params}, images, emb, mask, rng=rng,
            rngs={"dropout": rng}, train=False,
            method=BaseNetwork.predict_action,
        )

    a_ref = np.asarray(jax.jit(act)(base_params))

    @jax.jit
    def packed_step(packed_vec, shared_leaves):
        return act(unpack(packed_vec, shared_leaves))

    a_packed = np.asarray(packed_step(packed, shared))
    # two separately compiled programs: allow fusion-level float variation
    np.testing.assert_allclose(a_ref, a_packed, rtol=0, atol=2e-6)


def test_arg_packer_serving_step_parity():
    """pack_args=True must produce identical actions while cutting the
    per-tick dispatch surface to a handful of leaves."""
    from hypervla_tpu.flagship import build_flagship
    from hypervla_tpu.ops.serving import make_serving_step

    model, batch = build_flagship(tiny=True)
    stats = {"mean": np.zeros(7), "std": np.ones(7)}
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}
    base_params, _, _ = model.create_tasks(
        instruction_dict=instr, initial_state=example["initial_state"]
    )

    plain, init_history = make_serving_step(
        model, stats, image_size=224, crop=False, ensemble=False
    )
    packed_step, _ = make_serving_step(
        model, stats, image_size=224, crop=False, ensemble=False,
        pack_args=True,
    )
    emb = jnp.asarray(instr["language_instruction"]["token_embedding"])
    rng = jax.random.PRNGKey(1)
    packed = packed_step.pack_params(base_params, emb, rng)
    n_plain = len(jax.tree_util.tree_leaves(base_params)) + 2
    n_packed = len(jax.tree_util.tree_leaves(packed))
    assert n_packed < n_plain / 4, (n_packed, n_plain)

    frame = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (224, 224, 3)), jnp.uint8
    )
    a_ref, _ = plain(base_params, frame, emb, init_history(), 0, rng)
    # pack_args folds the episode constants: the tick passes only
    # (packed_episode, frame, history, step_idx)
    a_pack, _ = packed_step(packed, frame, init_history(), 0)
    np.testing.assert_allclose(
        np.asarray(a_pack), np.asarray(a_ref), atol=2e-6
    )


def test_scan_serving_matches_per_tick():
    """The K-tick lax.scan serving mode must thread history/step_idx
    exactly as K sequential per-tick calls (ensembler in-graph), in both
    the plain and packed-args variants."""
    from hypervla_tpu.flagship import build_flagship
    from hypervla_tpu.ops.serving import (
        make_scan_serving_step,
        make_serving_step,
    )

    model, batch = build_flagship(tiny=True)
    stats = {
        "mean": np.arange(7, dtype=np.float32) / 10,
        "std": 1 + np.arange(7, dtype=np.float32) / 7,
    }
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}
    base_params, _, _ = model.create_tasks(
        instruction_dict=instr, initial_state=example["initial_state"]
    )
    emb = jnp.asarray(instr["language_instruction"]["token_embedding"])
    rng = jax.random.PRNGKey(1)
    k = 4
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (k, 224, 224, 3)),
        jnp.uint8,
    )

    tick, init_history = make_serving_step(
        model, stats, image_size=224, crop=False, ensemble=True,
        ensemble_temp=0.5,
    )
    hist = init_history()
    expect = []
    for t in range(k):
        a, hist = tick(base_params, frames[t], emb, hist, t, rng)
        expect.append(np.asarray(a))
    expect_hist = np.asarray(hist)

    scan, scan_init = make_scan_serving_step(
        model, stats, k, image_size=224, crop=False, ensemble=True,
        ensemble_temp=0.5,
    )
    actions, hist2 = scan(base_params, frames, emb, scan_init(), 0, rng)
    np.testing.assert_allclose(
        np.asarray(actions), np.stack(expect), atol=2e-6
    )
    np.testing.assert_allclose(np.asarray(hist2), expect_hist, atol=2e-6)

    # packed variant: same actions, episode folded into flat buffers
    scan_p, _ = make_scan_serving_step(
        model, stats, k, image_size=224, crop=False, ensemble=True,
        ensemble_temp=0.5, pack_args=True,
    )
    packed = scan_p.pack_params(base_params, emb, rng)
    actions_p, _ = scan_p(packed, frames, scan_init(), 0)
    np.testing.assert_allclose(
        np.asarray(actions_p), np.stack(expect), atol=2e-6
    )


def test_arg_packer_roundtrip_mixed_dtypes():
    """make_arg_packer reconstructs an arbitrary mixed-dtype tree exactly,
    keeping big leaves as pass-through handles."""
    from hypervla_tpu.ops.serving import make_arg_packer

    tree = {
        "big": jnp.ones((2048, 1024), jnp.float32),       # 8 MB: stays
        "small_f32": jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4),
        "small_bf16": jnp.full((5,), 1.5, jnp.bfloat16),
        "nested": {"w": jnp.eye(8, dtype=jnp.float32)},
    }
    pack, unpack = make_arg_packer(tree, keep_bytes=4 * 1024 * 1024)
    packed, big = pack(tree)
    assert len(big) == 1 and big[0].shape == (2048, 1024)
    assert set(packed) == {"float32", "bfloat16"}
    out = jax.jit(unpack)(packed, big)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        tree, out,
    )


def test_arg_packer_coerce_bool_and_ints():
    """coerce=True folds bool and 32-bit int leaves (pad masks, PRNG key
    data) into the float32 buffer, bit-exactly — the episode-constant fold
    behind pack_args' 4-handle tick."""
    from hypervla_tpu.ops.serving import make_arg_packer

    tree = {
        "mask": jnp.array([[True, False], [False, True]]),
        "rng": jnp.array([0x9E3779B9, 0xDEADBEEF], jnp.uint32),
        "idx": jnp.array([-3, 7, 2**31 - 1], jnp.int32),
        "emb": jnp.arange(6.0, dtype=jnp.float32),
        "h": jnp.full((3,), 0.25, jnp.bfloat16),
    }
    pack, unpack = make_arg_packer(tree, coerce=True)
    packed, big = pack(tree)
    assert not big
    assert set(packed) == {"float32", "bfloat16"}, set(packed)
    out = jax.jit(unpack)(packed, big)
    for key in tree:
        got, want = np.asarray(out[key]), np.asarray(tree[key])
        assert got.dtype == want.dtype, (key, got.dtype, want.dtype)
        np.testing.assert_array_equal(got, want, err_msg=key)


def test_resolve_trunk_impl_rejects_typos():
    from hypervla_tpu.ops.serving import resolve_trunk_impl

    assert resolve_trunk_impl("scan") == "scan_serving"
    assert resolve_trunk_impl("unroll") == "unroll_serving"
    assert resolve_trunk_impl("pallas") == "pallas_serving"
    assert resolve_trunk_impl("scan_serving") == "scan_serving"
    with pytest.raises(ValueError, match="unrecognized trunk_kernel"):
        resolve_trunk_impl("Pallas")
    with pytest.raises(ValueError, match="unrecognized trunk_kernel"):
        resolve_trunk_impl(None)
