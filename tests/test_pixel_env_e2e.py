"""Closed-loop e2e across a REAL process boundary: PixelReachEnv (a real
gymnasium env) driven through a policy-server SUBPROCESS — reset (hypernet
generation) -> N x (render -> sample_actions -> ensemble -> postprocess)
over TCP, the loop the reference runs against SAPIEN
(/root/reference/data/simpler/evaluate.py:296-352)."""
import os
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_env_mechanics():
    from hypervla_tpu.eval.pixel_env import PixelReachEnv, scripted_expert

    env = PixelReachEnv(seed=0)
    obs, info = env.reset(seed=0)
    assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
    assert "task" in info
    # the scripted expert solves it well before the step cap
    for _ in range(40):
        action = scripted_expert(env._agent, env._goal)
        obs, reward, terminated, truncated, step_info = env.step(action)
        if terminated:
            break
    assert step_info["success"]


def test_closed_loop_through_server_subprocess(tmp_path):
    from hypervla_tpu.eval.pixel_env import PixelReachEnv
    from hypervla_tpu.eval.policy_server import PolicyClient
    from scripts.eval_pixel_env import (
        make_fresh_tiny_checkpoint,
        wait_for_server,
    )

    ckpt = make_fresh_tiny_checkpoint(str(tmp_path / "ckpt"))
    port = 29000 + (os.getpid() % 2000)
    env_vars = dict(os.environ)
    env_vars["PYTHONPATH"] = (
        REPO + os.pathsep + env_vars.get("PYTHONPATH", "")
    )
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "hypervla_tpu.eval.policy_server",
            "--checkpoint", ckpt, "--port", str(port),
            "--policy_setup", "libero", "--image_size", "64",
            "--action_ensemble", "--cpu",
        ],
        env=env_vars,
    )
    try:
        client = wait_for_server(PolicyClient, "127.0.0.1", port, proc)
        env = PixelReachEnv(seed=0, max_steps=6)
        obs, _ = env.reset(seed=0)
        t0 = time.perf_counter()
        client.reset(env.get_task_description())
        reset_s = time.perf_counter() - t0
        ticks = 0
        while True:
            reply = client.step(obs)
            action = np.asarray(reply["action"], float)
            assert action.shape == (7,)
            assert np.all(np.isfinite(action))
            assert reply["model_time"] >= 0
            obs, _, terminated, truncated, _ = env.step(action)
            ticks += 1
            if terminated or truncated:
                break
        assert ticks >= 1
        assert reset_s > 0
        client.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)
