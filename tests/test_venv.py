"""Vectorized-env worker tests using a trivial counting environment."""
import numpy as np
import pytest

from hypervla_tpu.eval.venv import DummyVectorEnv, ShArray, SubprocVectorEnv

pytestmark = pytest.mark.slow


class CountingEnv:
    """Minimal env: observation counts steps; done after 3 steps."""

    def __init__(self, offset=0):
        self.offset = offset
        self.t = 0

    def reset(self, **kwargs):
        self.t = 0
        return self._obs(), {}

    def step(self, action):
        self.t += 1
        return self._obs(), float(action), self.t >= 3, False, {"t": self.t}

    def _obs(self):
        return {
            "image": np.full((4, 4, 3), self.t + self.offset, dtype=np.uint8),
            "state": np.array([self.t], dtype=np.float32),
        }

    def close(self):
        pass


def test_sharray_roundtrip():
    sh = ShArray(np.uint8, (2, 3))
    sh.save(np.arange(6, dtype=np.uint8).reshape(2, 3))
    np.testing.assert_array_equal(
        sh.get(), np.arange(6, dtype=np.uint8).reshape(2, 3)
    )


def test_dummy_vector_env():
    venv = DummyVectorEnv([lambda i=i: CountingEnv(i) for i in range(3)])
    obs, infos = venv.reset()
    assert len(obs) == 3
    np.testing.assert_array_equal(obs[2]["image"][0, 0], [2, 2, 2])
    obs, rewards, dones, truncs, infos = venv.step([1.0, 2.0, 3.0])
    assert rewards == [1.0, 2.0, 3.0]
    assert not any(dones)
    for _ in range(2):
        obs, rewards, dones, truncs, infos = venv.step([0.0] * 3)
    assert all(dones)
    venv.close()


@pytest.mark.skipif(
    False, reason="subprocess env test"
)
def test_subproc_vector_env_shared_memory():
    sample = CountingEnv().reset()[0]
    venv = SubprocVectorEnv(
        [lambda i=i: CountingEnv(i) for i in range(2)], obs_sample=sample
    )
    obs, infos = venv.reset()
    np.testing.assert_array_equal(obs[1]["image"][0, 0], [1, 1, 1])
    obs, rewards, dones, truncs, infos = venv.step([5.0, 6.0])
    assert rewards == [5.0, 6.0]
    np.testing.assert_array_equal(obs[0]["state"], [1.0])
    venv.close()
