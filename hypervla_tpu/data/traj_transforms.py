"""Trajectory transforms (parity: octo/data/traj_transforms.py) — numpy.

Each transform takes a trajectory dict whose arrays share the leading
trajectory-length axis.
"""
from typing import Optional

import numpy as np

from hypervla_tpu.data.data_utils import tree_map


def chunk_act_obs(traj: dict, window_size: int = 1, action_horizon: int = 1) -> dict:
    """Chunks observations into [traj_len, window_size, ...] histories and
    actions into [traj_len, window_size, action_horizon, action_dim] chunks,
    with timestep/action pad masks and the task_completed goal-distance flag.
    """
    traj_len = traj["action"].shape[0]

    history_indices = np.arange(traj_len)[:, None] + np.arange(
        -window_size + 1, 1
    )  # [traj_len, window_size]
    timestep_pad_mask = history_indices >= 0
    history_indices = np.maximum(history_indices, 0)

    traj["observation"] = tree_map(
        lambda x: x[history_indices], traj["observation"]
    )
    traj["observation"]["timestep_pad_mask"] = timestep_pad_mask

    if traj["action"].ndim == 2:
        action_chunk_indices = np.arange(traj_len)[:, None] + np.arange(
            action_horizon
        )
        action_chunk_indices = np.minimum(action_chunk_indices, traj_len - 1)
        traj["action"] = traj["action"][action_chunk_indices]
    else:
        if traj["action"].shape[1] < action_horizon:
            raise ValueError(
                f"action_horizon ({action_horizon}) > pre-chunked dim "
                f"({traj['action'].shape[1]})"
            )
        traj["action"] = traj["action"][:, :action_horizon]

    traj["action"] = traj["action"][history_indices]

    if "timestep" in traj.get("task", {}):
        goal_timestep = traj["task"]["timestep"]
    else:
        goal_timestep = np.full([traj_len], traj_len - 1)

    t, w, h = np.meshgrid(
        np.arange(traj_len),
        np.arange(window_size),
        np.arange(action_horizon),
        indexing="ij",
    )
    relative_goal_timestep = goal_timestep[:, None, None] - (
        t - (window_size + 1) + w + h
    )
    traj["observation"]["task_completed"] = relative_goal_timestep <= 0

    traj["action_pad_mask"] = np.logical_and(
        traj["action_pad_mask"][:, None, None, :]
        if traj["action_pad_mask"].ndim == 2
        else traj["action_pad_mask"][:, None, :],
        np.logical_not(traj["observation"]["task_completed"])[:, :, :, None],
    )
    return traj


def subsample(traj: dict, subsample_length: int,
              rng: Optional[np.random.Generator] = None) -> dict:
    """Uniformly subsamples the trajectory to subsample_length frames."""
    rng = rng or np.random.default_rng()
    traj_len = traj["action"].shape[0]
    if traj_len > subsample_length:
        indices = rng.permutation(traj_len)[:subsample_length]
        traj = tree_map(lambda x: x[indices], traj)
    return traj


def add_pad_mask_dict(traj: dict) -> dict:
    """Adds per-key padding indicators: string keys (serialized images /
    language) are padding iff empty."""
    traj_len = traj["action"].shape[0]
    for key in ["observation", "task", "initial_state"]:
        if key not in traj:
            continue
        pad_mask_dict = {}
        for subkey in traj[key]:
            arr = traj[key][subkey]
            if isinstance(arr, np.ndarray) and arr.dtype.kind in ("S", "U", "O"):
                lengths = np.array(
                    [len(x) if x is not None else 0 for x in arr.reshape(-1)]
                ).reshape(arr.shape)
                pad_mask_dict[subkey] = lengths != 0
            else:
                pad_mask_dict[subkey] = np.ones([traj_len], dtype=bool)
        traj[key]["pad_mask_dict"] = pad_mask_dict
    return traj


def pad_actions_and_proprio(
    traj: dict, max_action_dim: Optional[int], max_proprio_dim: Optional[int]
) -> dict:
    """Zero-pads action/proprio dims to dataset-mix-wide maxima and records
    which dims are real in "action_pad_mask"."""
    traj["action_pad_mask"] = np.ones_like(traj["action"], dtype=bool)
    if max_action_dim is not None:
        action_dim = traj["action"].shape[-1]
        if action_dim > max_action_dim:
            raise ValueError(
                f"action_dim ({action_dim}) > max_action_dim ({max_action_dim})"
            )
        for key in ("action", "action_pad_mask"):
            pad_width = [[0, 0]] * (traj[key].ndim - 1) + [
                [0, max_action_dim - action_dim]
            ]
            traj[key] = np.pad(traj[key], pad_width)
    if max_proprio_dim is not None and "proprio" in traj.get("observation", {}):
        proprio_dim = traj["observation"]["proprio"].shape[-1]
        if proprio_dim > max_proprio_dim:
            raise ValueError(
                f"proprio_dim ({proprio_dim}) > max_proprio_dim "
                f"({max_proprio_dim})"
            )
        traj["observation"]["proprio"] = np.pad(
            traj["observation"]["proprio"],
            [[0, 0], [0, max_proprio_dim - proprio_dim]],
        )
    return traj
