"""Offline policy-vs-dataset visualization + metrics
(parity: octo/utils/visualization_lib.py, functional subset).

Runs a policy over held-out trajectories, unnormalizes, and computes the
manipulation metrics the reference logs to wandb (gripper correctness, xyz
direction angle/closeness, per-dimension MSE). Plotting is gated on
matplotlib; metrics are plain numpy and always available.
"""
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np


def unnormalize(arr, mean, std, mask=None, **kwargs):
    mean = np.asarray(mean)
    std = np.asarray(std)
    if mask is None:
        mask = np.ones_like(mean, dtype=bool)
    return np.where(mask, arr * std + mean, arr)


def run_policy_on_trajectory(policy_fn, traj, *, text_processor=None):
    """Applies policy_fn to every frame of a chunked trajectory dict; returns
    the trajectory augmented with predicted actions."""
    tasks = dict(traj["task"])
    if text_processor is not None and not isinstance(
        tasks.get("language_instruction"), dict
    ):
        tasks["language_instruction"] = text_processor.encode(
            [
                s.decode("utf-8") if isinstance(s, bytes) else str(s)
                for s in tasks["language_instruction"]
            ]
        )
    pred_actions = policy_fn(traj["observation"], tasks)
    return {
        **traj,
        "pred_actions": np.asarray(pred_actions),
    }


# ------------------------- manipulation metrics -------------------------


def _get_gripper(actions):
    return actions[..., -1]


def _get_xyz(actions):
    return actions[..., :3]


def _gripper_closed(actions):
    return _get_gripper(actions) < 0.5


def _gripper_correct(unnorm_actions, unnorm_pred_actions, **kwargs):
    return _gripper_closed(unnorm_actions) == _gripper_closed(
        unnorm_pred_actions
    )


def _xyz_angle(unnorm_actions, unnorm_pred_actions, **kwargs):
    def angle_between(v1, v2):
        v1_u = v1 / np.maximum(np.linalg.norm(v1, axis=-1, keepdims=True),
                               1e-12)
        v2_u = v2 / np.maximum(np.linalg.norm(v2, axis=-1, keepdims=True),
                               1e-12)
        return np.arccos(np.clip(np.sum(v1_u * v2_u, axis=-1), -1.0, 1.0))

    return angle_between(_get_xyz(unnorm_actions),
                         _get_xyz(unnorm_pred_actions))


def _xyz_close(unnorm_actions, unnorm_pred_actions, threshold=0.05, **kwargs):
    dist = np.linalg.norm(
        _get_xyz(unnorm_actions) - _get_xyz(unnorm_pred_actions), axis=-1
    )
    return dist < threshold


def _mse(actions, pred_actions, dims=None, **kwargs):
    delta = actions - pred_actions
    if dims is not None:
        delta = delta[..., dims]
    return np.sum(delta**2, axis=-1)


def _moving(unnorm_actions, axis=None, magnitude=0.0, **kwargs):
    if axis is None:
        return (
            np.linalg.norm(_get_xyz(unnorm_actions), axis=-1) > magnitude
        )
    return np.abs(unnorm_actions[..., axis]) > magnitude


def add_manipulation_metrics(info: Dict[str, Any]) -> Dict[str, Any]:
    """Adds the standard manipulation metrics given a dict with keys
    actions / pred_actions / unnorm_actions / unnorm_pred_actions."""
    metrics = {
        "gripper_correct": _gripper_correct(**info),
        "xyz_angle": _xyz_angle(**info),
        "xyz_close": _xyz_close(**info),
        "mse": _mse(info["actions"], info["pred_actions"]),
        "moving": _moving(**info),
    }
    return {**info, **metrics}


@dataclass
class Visualizer:
    """Offline metrics over a validation dataset of chunked trajectories."""

    dataset: Any
    text_processor: Optional[Any] = None
    cache_trajs: bool = True
    _cached: list = field(default_factory=list)

    def _iter_trajs(self, n):
        if self._cached and self.cache_trajs:
            yield from self._cached[:n]
            return
        for i, traj in enumerate(self.dataset):
            if i >= n:
                break
            if self.cache_trajs:
                self._cached.append(traj)
            yield traj

    def metrics_for_wandb(self, policy_fn, n_trajs: int = 8) -> Dict[str, float]:
        """Runs the policy over n trajectories and aggregates the metrics."""
        stats = None
        unnorm = getattr(self.dataset, "dataset_statistics", None)
        if isinstance(unnorm, dict) and "action" in unnorm:
            stats = unnorm["action"]

        all_metrics = []
        for traj in self._iter_trajs(n_trajs):
            out = run_policy_on_trajectory(
                policy_fn, traj, text_processor=self.text_processor
            )
            actions = np.asarray(traj["action"])[:, -1]
            pred = out["pred_actions"]
            pred = pred.reshape(actions.shape)
            if stats is not None:
                unnorm_actions = unnormalize(actions, **{
                    k: stats[k] for k in ("mean", "std") if k in stats
                }, mask=stats.get("mask"))
                unnorm_pred = unnormalize(pred, **{
                    k: stats[k] for k in ("mean", "std") if k in stats
                }, mask=stats.get("mask"))
            else:
                unnorm_actions, unnorm_pred = actions, pred
            info = add_manipulation_metrics(
                dict(
                    actions=actions,
                    pred_actions=pred,
                    unnorm_actions=unnorm_actions,
                    unnorm_pred_actions=unnorm_pred,
                )
            )
            all_metrics.append(
                {
                    k: float(np.mean(v))
                    for k, v in info.items()
                    if k in ("gripper_correct", "xyz_angle", "xyz_close",
                             "mse", "moving")
                }
            )
        return {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        } if all_metrics else {}

    def raw_evaluations(self, policy_fn, n_trajs: int = 8):
        """Returns the per-trajectory raw info dicts (un-aggregated)."""
        infos = []
        for traj in self._iter_trajs(n_trajs):
            out = run_policy_on_trajectory(
                policy_fn, traj, text_processor=self.text_processor
            )
            infos.append(out)
        return infos

    def visualize_for_wandb(self, policy_fn, n_trajs: int = 2):
        """Returns {name: matplotlib figure} of action-vs-prediction plots."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return {}
        figures = {}
        for idx, traj in enumerate(self._iter_trajs(n_trajs)):
            out = run_policy_on_trajectory(
                policy_fn, traj, text_processor=self.text_processor
            )
            actions = np.asarray(traj["action"])[:, -1, 0]
            pred = out["pred_actions"].reshape(np.asarray(traj["action"]).shape)[
                :, -1, 0
            ]
            n_dims = actions.shape[-1]
            fig, axes = plt.subplots(
                n_dims, 1, figsize=(8, 2 * n_dims), squeeze=False
            )
            for d in range(n_dims):
                axes[d, 0].plot(actions[:, d], label="dataset")
                axes[d, 0].plot(pred[:, d], label="policy")
                axes[d, 0].set_ylabel(f"dim {d}")
            axes[0, 0].legend()
            figures[f"trajectory_{idx}"] = fig
        return figures


@dataclass
class RolloutVisualizer:
    """Closed-loop rollout metrics + optional frame capture
    (parity: octo/utils/visualization_lib.py:270-395).

    env_fn builds a gym-style environment (wrapped with the chain from
    eval/gym_wrappers.py); policy_fn maps a stacked observation dict to an
    action chunk.
    """

    env_fn: Callable
    name: str = "rollout"
    max_episode_length: int = 200

    def run_rollouts(self, policy_fn, n_rollouts: int = 10,
                     n_vis_rollouts: int = 3, record_key: str = "image_primary"):
        env = self.env_fn()
        episode_returns, episode_lengths, videos = [], [], []
        for rollout_idx in range(n_rollouts):
            obs, info = env.reset()
            done, trunc = False, False
            total_reward, length = 0.0, 0
            frames = []
            while not (done or trunc) and length < self.max_episode_length:
                if rollout_idx < n_vis_rollouts and record_key in obs:
                    frame = np.asarray(obs[record_key])
                    frames.append(frame[-1] if frame.ndim == 4 else frame)
                action = policy_fn(obs)
                obs, reward, done, trunc, info = env.step(action)
                total_reward += float(reward)
                length += 1
            episode_returns.append(total_reward)
            episode_lengths.append(length)
            if frames:
                videos.append(np.stack(frames))
        if hasattr(env, "close"):
            env.close()
        metrics = {
            f"{self.name}/mean_return": float(np.mean(episode_returns)),
            f"{self.name}/mean_length": float(np.mean(episode_lengths)),
            f"{self.name}/success_rate": float(
                np.mean([r > 0 for r in episode_returns])
            ),
        }
        return metrics, videos
