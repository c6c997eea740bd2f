"""Gym environment wrappers (parity: octo/utils/gym_wrappers.py), TF-free.

History stacking with pad masks, receding-horizon control, temporal
ensembling, image resize matching the training pipeline (lanczos3 then the
average crop-and-resize of the train-time augmentation), and proprio
normalization. `gym` is imported lazily so TPU hosts without simulators can
import the package.
"""
import logging
from collections import deque
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _gym():
    try:
        import gym
    except ImportError:
        # the wrappers use the 5-tuple step API, which gymnasium shares
        import gymnasium as gym

    return gym


def stack_and_pad(history: deque, num_obs: int):
    horizon = len(history)
    full_obs = {k: np.stack([dic[k] for dic in history]) for k in history[0]}
    pad_length = horizon - min(num_obs, horizon)
    timestep_pad_mask = np.ones(horizon)
    timestep_pad_mask[:pad_length] = 0
    full_obs["timestep_pad_mask"] = timestep_pad_mask
    return full_obs


def space_stack(space, repeat: int):
    gym = _gym()
    if isinstance(space, gym.spaces.Box):
        return gym.spaces.Box(
            low=np.repeat(space.low[None], repeat, axis=0),
            high=np.repeat(space.high[None], repeat, axis=0),
            dtype=space.dtype,
        )
    elif isinstance(space, gym.spaces.Discrete):
        return gym.spaces.MultiDiscrete([space.n] * repeat)
    elif isinstance(space, gym.spaces.Dict):
        return gym.spaces.Dict(
            {k: space_stack(v, repeat) for k, v in space.spaces.items()}
        )
    raise ValueError(f"Space {space} is not supported.")


def listdict2dictlist(LD):
    return {k: [dic[k] for dic in LD] for k in LD[0]}


def add_octo_env_wrappers(
    env,
    action_proprio_metadata: dict,
    horizon: int,
    exec_horizon: int,
    resize_size: Optional[Dict[str, Tuple]] = None,
    use_temp_ensembling: bool = True,
):
    """Stacks the standard wrapper chain: proprio norm -> resize -> history ->
    temporal ensemble / receding horizon."""
    env = NormalizeProprio(env, action_proprio_metadata)
    env = ResizeImageWrapper(env, resize_size)
    env = HistoryWrapper(env, horizon)
    if use_temp_ensembling:
        env = TemporalEnsembleWrapper(env, exec_horizon)
    else:
        env = RHCWrapper(env, exec_horizon)
    return env


def _wrapper_base():
    return _gym().Wrapper


class HistoryWrapper:
    """Accumulates `horizon` observations with a timestep_pad_mask."""

    def __new__(cls, env, horizon: int):
        gym = _gym()

        class _HistoryWrapper(gym.Wrapper):
            def __init__(self, env, horizon):
                super().__init__(env)
                self.horizon = horizon
                self.history = deque(maxlen=horizon)
                self.num_obs = 0
                self.observation_space = space_stack(
                    self.env.observation_space, horizon
                )

            def step(self, action):
                obs, reward, done, trunc, info = self.env.step(action)
                self.num_obs += 1
                self.history.append(obs)
                assert len(self.history) == self.horizon
                return (
                    stack_and_pad(self.history, self.num_obs),
                    reward, done, trunc, info,
                )

            def reset(self, **kwargs):
                obs, info = self.env.reset(**kwargs)
                self.num_obs = 1
                self.history.extend([obs] * self.horizon)
                return stack_and_pad(self.history, self.num_obs), info

        return _HistoryWrapper(env, horizon)


class RHCWrapper:
    """Receding-horizon control: execute exec_horizon of the predicted chunk."""

    def __new__(cls, env, exec_horizon: int):
        gym = _gym()

        class _RHCWrapper(gym.Wrapper):
            def __init__(self, env, exec_horizon):
                super().__init__(env)
                self.exec_horizon = exec_horizon

            def step(self, actions):
                if self.exec_horizon == 1 and len(actions.shape) == 1:
                    actions = actions[None]
                assert len(actions) >= self.exec_horizon
                rewards, observations, infos = [], [], []
                for i in range(self.exec_horizon):
                    obs, reward, done, trunc, info = self.env.step(actions[i])
                    observations.append(obs)
                    rewards.append(reward)
                    infos.append(info)
                    if done or trunc:
                        break
                infos = listdict2dictlist(infos)
                infos["rewards"] = rewards
                infos["observations"] = observations
                return obs, np.sum(rewards), done, trunc, infos

        return _RHCWrapper(env, exec_horizon)


class TemporalEnsembleWrapper:
    """Temporal ensembling (ACT-style) over overlapping action chunks."""

    def __new__(cls, env, pred_horizon: int, exp_weight: int = 0):
        gym = _gym()

        class _TemporalEnsembleWrapper(gym.Wrapper):
            def __init__(self, env, pred_horizon, exp_weight):
                super().__init__(env)
                self.pred_horizon = pred_horizon
                self.exp_weight = exp_weight
                self.act_history = deque(maxlen=pred_horizon)
                self.action_space = space_stack(
                    self.env.action_space, pred_horizon
                )

            def step(self, actions):
                assert len(actions) >= self.pred_horizon
                self.act_history.append(actions[: self.pred_horizon])
                num_actions = len(self.act_history)
                curr_act_preds = np.stack(
                    [
                        pred_actions[i]
                        for (i, pred_actions) in zip(
                            range(num_actions - 1, -1, -1), self.act_history
                        )
                    ]
                )
                weights = np.exp(
                    -self.exp_weight * np.arange(num_actions)
                )
                weights = weights / weights.sum()
                action = np.sum(weights[:, None] * curr_act_preds, axis=0)
                return self.env.step(action)

            def reset(self, **kwargs):
                self.act_history = deque(maxlen=self.pred_horizon)
                return self.env.reset(**kwargs)

        return _TemporalEnsembleWrapper(env, pred_horizon, exp_weight)


class ResizeImageWrapper:
    """lanczos3 resize + average crop-and-resize of the training augmentation."""

    def __new__(
        cls,
        env,
        resize_size: Optional[Dict[str, Tuple]] = None,
        augmented_keys: Sequence[str] = ("image_primary",),
        avg_scale: float = 0.9,
        avg_ratio: float = 1.0,
    ):
        gym = _gym()

        class _ResizeImageWrapper(gym.ObservationWrapper):
            def __init__(self, env):
                super().__init__(env)
                assert isinstance(self.observation_space, gym.spaces.Dict)
                spaces = self.observation_space.spaces
                self.resize_size = resize_size
                self.augmented_keys = augmented_keys
                new_height = float(np.clip(np.sqrt(avg_scale / avg_ratio), 0, 1))
                new_width = float(np.clip(np.sqrt(avg_scale * avg_ratio), 0, 1))
                height_offset = (1 - new_height) / 2
                width_offset = (1 - new_width) / 2
                self.bounding_box = (
                    height_offset,
                    width_offset,
                    height_offset + new_height,
                    width_offset + new_width,
                )
                if resize_size is None:
                    self.keys_to_resize = {}
                else:
                    self.keys_to_resize = {
                        f"image_{i}": resize_size[i] for i in resize_size
                    }
                logging.info(f"Resizing images: {self.keys_to_resize}")
                for k, size in self.keys_to_resize.items():
                    spaces[k] = gym.spaces.Box(
                        low=0, high=255, shape=size + (3,), dtype=np.uint8
                    )
                self.observation_space = gym.spaces.Dict(spaces)

            def observation(self, observation):
                import jax.numpy as jnp

                from hypervla_tpu.eval.inference import (
                    _crop_and_resize_bilinear,
                )
                from hypervla_tpu.ops import preprocess

                for k, size in self.keys_to_resize.items():
                    image = preprocess.resize_image(
                        jnp.asarray(observation[k]), size
                    )
                    if k in self.augmented_keys:
                        image = _crop_and_resize_bilinear(
                            image.astype(jnp.float32), self.bounding_box, size
                        )
                        image = jnp.clip(
                            jnp.round(image), 0, 255
                        ).astype(jnp.uint8)
                    observation[k] = np.asarray(image)
                return observation

        return _ResizeImageWrapper(env)


class NormalizeProprio:
    """Normalizes proprio observations with dataset statistics."""

    def __new__(cls, env, action_proprio_metadata: dict):
        gym = _gym()

        class _NormalizeProprio(gym.ObservationWrapper):
            def __init__(self, env):
                import jax

                self.action_proprio_metadata = jax.tree_util.tree_map(
                    lambda x: np.array(x),
                    action_proprio_metadata,
                    is_leaf=lambda x: isinstance(x, list),
                )
                super().__init__(env)

            def normalize(self, data, metadata):
                mask = metadata.get(
                    "mask", np.ones_like(metadata["mean"], dtype=bool)
                )
                return np.where(
                    mask,
                    (data - metadata["mean"]) / (metadata["std"] + 1e-8),
                    data,
                )

            def observation(self, obs):
                if "proprio" in self.action_proprio_metadata:
                    obs["proprio"] = self.normalize(
                        obs["proprio"], self.action_proprio_metadata["proprio"]
                    )
                else:
                    assert "proprio" not in obs, (
                        "Cannot normalize proprio without metadata."
                    )
                return obs

        return _NormalizeProprio(env)
