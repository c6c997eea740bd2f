"""Gym wrapper tests (parity: octo/utils/gym_wrappers.py): history stacking
with pad masks, receding-horizon control, temporal ensembling, resize chain."""
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from hypervla_tpu.eval.gym_wrappers import (  # noqa: E402
    HistoryWrapper,
    RHCWrapper,
    ResizeImageWrapper,
    TemporalEnsembleWrapper,
    add_octo_env_wrappers,
    stack_and_pad,
)


class CountingEnv(gym.Env):
    """Observation = step counter; reward = the action's first element."""

    def __init__(self, image_size=32):
        self.observation_space = gym.spaces.Dict(
            {
                "image_primary": gym.spaces.Box(
                    0, 255, (image_size, image_size, 3), np.uint8
                ),
                "step": gym.spaces.Box(-np.inf, np.inf, (1,), np.float32),
            }
        )
        self.action_space = gym.spaces.Box(-1, 1, (7,), np.float32)
        self.image_size = image_size
        self.t = 0

    def _obs(self):
        return {
            "image_primary": np.full(
                (self.image_size, self.image_size, 3), self.t % 255, np.uint8
            ),
            "step": np.array([self.t], np.float32),
        }

    def reset(self, **kwargs):
        self.t = 0
        return self._obs(), {}

    def step(self, action):
        self.t += 1
        return self._obs(), float(np.asarray(action).ravel()[0]), self.t >= 20, False, {}


def test_history_wrapper_pad_mask():
    env = HistoryWrapper(CountingEnv(), horizon=3)
    obs, _ = env.reset()
    assert obs["step"].shape == (3, 1)
    # reset repeats the first obs; only the newest is real
    np.testing.assert_array_equal(obs["timestep_pad_mask"], [0, 0, 1])
    obs, *_ = env.step(np.zeros(7))
    np.testing.assert_array_equal(obs["timestep_pad_mask"], [0, 1, 1])
    np.testing.assert_array_equal(obs["step"][:, 0], [0, 0, 1])
    obs, *_ = env.step(np.zeros(7))
    obs, *_ = env.step(np.zeros(7))
    np.testing.assert_array_equal(obs["timestep_pad_mask"], [1, 1, 1])
    np.testing.assert_array_equal(obs["step"][:, 0], [1, 2, 3])


def test_rhc_wrapper_executes_chunk():
    env = RHCWrapper(CountingEnv(), exec_horizon=3)
    env.reset()
    chunk = np.arange(4 * 7, dtype=np.float32).reshape(4, 7)
    obs, reward, done, trunc, infos = env.step(chunk)
    # rewards are the first elements of the 3 executed actions: 0, 7, 14
    assert reward == 0 + 7 + 14
    assert len(infos["rewards"]) == 3
    assert obs["step"][0] == 3


def test_temporal_ensemble_wrapper_averages_chunks():
    env = TemporalEnsembleWrapper(CountingEnv(), pred_horizon=2, exp_weight=0)
    env.reset()
    # first chunk: executes its first action (only one in history)
    _, r1, *_ = env.step(np.ones((2, 7), np.float32))
    assert r1 == 1.0
    # second chunk of 3s: ensemble = mean(prev_chunk[1]=1, new_chunk[0]=3) = 2
    _, r2, *_ = env.step(3 * np.ones((2, 7), np.float32))
    assert r2 == 2.0


def test_resize_wrapper_and_full_chain():
    env = add_octo_env_wrappers(
        CountingEnv(image_size=64),
        action_proprio_metadata={},
        horizon=2,
        exec_horizon=2,
        resize_size={"primary": (32, 32)},
        use_temp_ensembling=True,
    )
    obs, _ = env.reset()
    assert obs["image_primary"].shape == (2, 32, 32, 3)
    assert obs["timestep_pad_mask"].shape == (2,)
    obs, reward, done, trunc, info = env.step(np.zeros((2, 7), np.float32))
    assert obs["image_primary"].dtype == np.uint8


def test_stack_and_pad():
    from collections import deque

    hist = deque([{"a": np.array([i])} for i in range(4)], maxlen=4)
    out = stack_and_pad(hist, num_obs=2)
    np.testing.assert_array_equal(out["timestep_pad_mask"], [0, 0, 1, 1])
    np.testing.assert_array_equal(out["a"][:, 0], [0, 1, 2, 3])
