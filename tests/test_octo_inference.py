"""OctoInference wrapper test (parity: data/simpler/octo_model.py): image
history + pad masks, ensembling, axis-angle conversion, sticky gripper."""
import numpy as np
import pytest


class _MockOctoModel:
    """Deterministic stand-in exposing the OctoModel inference surface."""

    def __init__(self, horizon=4, action_dim=7):
        self.horizon = horizon
        self.action_dim = action_dim
        self.dataset_statistics = {
            "fractal20220817_data": {
                "action": {
                    "mean": np.zeros(action_dim, np.float32),
                    "std": np.ones(action_dim, np.float32),
                }
            }
        }
        self.sampled_obs = []

    def create_tasks(self, texts):
        return {"texts": tuple(texts)}

    def sample_actions(self, observations, task, unnormalization_statistics,
                       rng):
        self.sampled_obs.append(observations)
        chunk = np.zeros((1, self.horizon, self.action_dim), np.float32)
        chunk[:, :, -1] = 1.0  # gripper open
        return chunk


def test_octo_inference_history_and_gripper():
    from hypervla_tpu.eval.octo_inference import OctoInference

    model = _MockOctoModel()
    policy = OctoInference(
        model, policy_setup="google_robot", horizon=2, image_size=32,
        action_ensemble=True,
    )
    policy.reset("pick the block")
    assert model.create_tasks(["pick the block"]) == {
        "texts": ("pick the block",)
    }

    frame = np.zeros((64, 64, 3), np.uint8)
    raw, flat = policy.step(frame)
    assert flat.shape == (7,)
    # first step: history has 1 real frame -> pad mask [0, 1]... history len 1
    obs = model.sampled_obs[-1]
    assert obs["image_primary"].shape[2:] == (32, 32, 3)
    raw, flat = policy.step(frame)
    obs = model.sampled_obs[-1]
    assert obs["image_primary"].shape[1] == 2
    np.testing.assert_array_equal(obs["timestep_pad_mask"][0], [1, 1])

    # gripper stays 1.0 every step -> relative action 0 (no sticky trigger)
    assert flat[-1] == 0.0
    assert not policy.sticky_action_is_on


def test_octo_inference_sticky_gripper_fires_and_resets():
    from hypervla_tpu.eval.octo_inference import OctoInference

    model = _MockOctoModel()
    policy = OctoInference(
        model, policy_setup="google_robot", horizon=1, image_size=32,
        action_ensemble=False,
    )
    policy.sticky_gripper_num_repeat = 3
    policy.reset("close the drawer")
    frame = np.zeros((16, 16, 3), np.uint8)
    policy.step(frame)  # gripper 1.0, previous None -> relative 0
    # flip the model's gripper output to closed
    def closed(observations, task, unnormalization_statistics, rng):
        chunk = np.zeros((1, model.horizon, model.action_dim), np.float32)
        return chunk
    model.sample_actions = closed
    _, flat = policy.step(frame)  # relative = 1.0 - 0.0 = 1.0 -> sticky on
    assert policy.sticky_action_is_on
    assert flat[-1] == 1.0
    _, flat = policy.step(frame)  # sticky repeat
    assert flat[-1] == 1.0
    _, flat = policy.step(frame)  # third repeat == num_repeat -> reset
    assert not policy.sticky_action_is_on


def test_octo_inference_widowx_binary_gripper():
    from hypervla_tpu.eval.octo_inference import OctoInference

    model = _MockOctoModel()
    model.dataset_statistics["bridge_dataset"] = model.dataset_statistics[
        "fractal20220817_data"
    ]
    policy = OctoInference(
        model, policy_setup="widowx_bridge", horizon=1, image_size=32,
        action_ensemble=False,
    )
    policy.reset("wipe the table")
    _, flat = policy.step(np.zeros((16, 16, 3), np.uint8))
    assert flat[-1] == 1.0  # raw 1.0 > 0.5 -> +1
