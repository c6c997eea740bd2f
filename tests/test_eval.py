"""Eval-runtime tests: ensembling, rotation conversions, the closed-loop
InferenceWrapper (full reset/step episode on a tiny model), and the policy
server over a local socket."""
import threading

import jax
import numpy as np
import pytest

from hypervla_tpu.configs import tiny_test_config
from hypervla_tpu.eval.action_ensemble import ActionEnsembler, BatchActionEnsembler
from hypervla_tpu.eval.action_space import (
    axangle2euler,
    convert_axangle_to_rpy,
    euler2axangle,
)
from hypervla_tpu.eval.inference import InferenceWrapper
from hypervla_tpu.models.hypervla import HyperVLA

from helpers import make_example_batch


def test_action_ensembler_uniform_average():
    ens = ActionEnsembler(pred_action_horizon=2, action_ensemble_temp=0.0)
    a1 = np.array([[1.0, 1.0], [3.0, 3.0]])  # chunk at t=0
    a2 = np.array([[5.0, 5.0], [7.0, 7.0]])  # chunk at t=1
    out1 = ens.ensemble_action(a1)
    np.testing.assert_allclose(out1, [1.0, 1.0])
    out2 = ens.ensemble_action(a2)
    # average of a1's step-1 prediction (3) and a2's step-0 prediction (5)
    np.testing.assert_allclose(out2, [4.0, 4.0])


def test_batch_action_ensembler_matches_single():
    single = ActionEnsembler(3)
    batched = BatchActionEnsembler(3)
    rng = np.random.RandomState(0)
    for _ in range(4):
        chunk = rng.randn(3, 7)
        s = single.ensemble_action(chunk)
        b = batched.ensemble_action(chunk[None])
        np.testing.assert_allclose(s, b[0], atol=1e-12)


def test_euler_axangle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        rpy = rng.uniform(-1.0, 1.0, 3)
        ax, angle = euler2axangle(*rpy)
        np.testing.assert_allclose(np.linalg.norm(ax), 1.0, atol=1e-8)
        rpy2 = axangle2euler(ax, angle)
        np.testing.assert_allclose(rpy, rpy2, atol=1e-6)
    # convert_axangle_to_rpy inverts the axangle*angle encoding
    axangle = np.array([0.1, -0.2, 0.3], dtype=np.float64)
    rpy = convert_axangle_to_rpy(axangle)
    ax, angle = euler2axangle(*rpy)
    np.testing.assert_allclose(ax * angle, axangle, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_policy():
    config = tiny_test_config(encoder_type="SmallStem")
    config["dataset_kwargs"]["dataset_kwargs"] = {
        "action_proprio_normalization_type": "normal"
    }
    batch = make_example_batch(image_size=64)
    stats = {
        "action": {
            "mean": np.zeros(7, np.float32),
            "std": np.ones(7, np.float32),
            "p01": -np.ones(7, np.float32),
            "p99": np.ones(7, np.float32),
            "mask": np.array([True] * 6 + [False]),
        }
    }
    model = HyperVLA.from_config(
        config, batch, jax.random.PRNGKey(0), dataset_statistics=stats
    )
    return model, batch


def _instruction_dict(batch):
    ex = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    return {"language_instruction": ex["task"]["language_instruction"]}


def test_inference_wrapper_episode(tiny_policy):
    model, batch = tiny_policy
    wrapper = InferenceWrapper(
        model=model,
        policy_setup="google_robot",
        horizon=1,
        pred_action_horizon=2,
        image_size=64,
        action_ensemble=True,
        crop=True,
    )
    wrapper.reset("close top drawer", _instruction_dict(batch))
    image = np.random.RandomState(0).randint(
        0, 255, (128, 128, 3)
    ).astype(np.uint8)
    for step in range(3):
        raw_action, action, resized, _, model_time = wrapper.step(image)
        assert raw_action.shape == (7,)
        assert action.shape == (7,)  # world_vector(3) + axangle(3) + gripper
        assert resized.shape == (64, 64, 3)
        assert np.isfinite(action).all()
        assert model_time >= 0
    # sticky gripper state machine ran
    assert wrapper.episode_step == 3


def test_inference_wrapper_widowx_binarizes(tiny_policy):
    model, batch = tiny_policy
    wrapper = InferenceWrapper(
        model=model, policy_setup="widowx_bridge", horizon=1,
        pred_action_horizon=2, image_size=64,
    )
    wrapper.reset("put the spoon on the towel", _instruction_dict(batch))
    image = np.zeros((64, 64, 3), dtype=np.uint8)
    _, action, _, _, _ = wrapper.step(image)
    assert action[-1] in (-1.0, 1.0)


def test_policy_server_roundtrip(tiny_policy):
    from hypervla_tpu.eval.policy_server import PolicyClient, PolicyServer

    model, batch = tiny_policy
    wrapper = InferenceWrapper(
        model=model, policy_setup="libero", horizon=1,
        pred_action_horizon=2, image_size=64,
    )
    instruction = _instruction_dict(batch)

    def text_encode_fn(_):
        return instruction

    server = PolicyServer(wrapper, text_encode_fn, host="127.0.0.1", port=0)
    # bind manually to grab the ephemeral port
    import socket as socket_mod

    sock = socket_mod.socket()
    sock.setsockopt(socket_mod.SOL_SOCKET, socket_mod.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", 0))
    sock.listen(1)
    port = sock.getsockname()[1]

    def serve_one():
        conn, _ = sock.accept()
        server._handle(conn)

    t = threading.Thread(target=serve_one, daemon=True)
    t.start()

    client = PolicyClient("127.0.0.1", port)
    assert client.ping()["ok"]
    client.reset("pick up the mug")
    reply = client.step(np.zeros((64, 64, 3), dtype=np.uint8))
    assert reply["action"].shape == (7,)
    assert reply["model_time"] >= 0
    client.close()


def test_evaluate_orchestrator_argv():
    """The fan-out CLI builds correct child argv lists (no shell strings)."""
    import importlib
    import sys

    sys.path.insert(0, "scripts")
    try:
        ev = importlib.import_module("evaluate")
    finally:
        sys.path.pop(0)

    opts = dict(method="hypervla", folder="/ckpt", step_num=5000,
                window_size=1, action_ensemble=True, save_video=False,
                crop=True, recompute=False, EMA=0.999, policy_server=None)
    argv = ev.build_argv("hypervla_tpu.eval.simpler", ev._SIMPLER_SPECS,
                         opts, seed=2)
    assert argv[:3] == [sys.executable, "-m", "hypervla_tpu.eval.simpler"]
    assert argv[3:5] == ["--seeds", "2"]
    joined = " ".join(argv)
    assert "--model hypervla" in joined
    assert "--model_path /ckpt" in joined
    assert "--step 5000" in joined
    assert "--action_ensemble" in joined and "--crop" in joined
    assert "--save_video" not in joined and "--recompute" not in joined
    assert "--EMA 0.999" in joined
    assert "--policy_server" not in joined

    lopts = dict(folder="/ckpt", step_num=100, benchmark="libero_object",
                 recompute=True, EMA=0.999, policy_server="h:1")
    largv = ev.build_argv("hypervla_tpu.eval.libero", ev._LIBERO_SPECS,
                          lopts, seed=0)
    ljoined = " ".join(largv)
    assert "--benchmark libero_object" in ljoined
    assert "--recompute" in ljoined and "--policy_server h:1" in ljoined
