"""Training callbacks (parity: octo/utils/train_callbacks.py).

SaveCallback keeps the reference's dual-checkpointer layout: per-step params
via the model's save_pretrained contract (+ EMA_params.pkl pickle export for
artifact compatibility) and a latest-only full TrainState.
ValidationCallback computes held-out action-MSE per dataset with a jitted
batched hypernet apply + vmapped base-net predict.
"""
import logging
import os
import pickle
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SaveCallback:
    """Dual checkpointer (parity: the reference's per-step param export +
    resumable state). Device->host copies happen synchronously (the TrainState
    buffers are donated through the next step); serialization and disk IO run
    on a background thread so the train loop never blocks on a 350MB+ write.
    """

    def __init__(self, save_dir: Optional[str], async_save: bool = True):
        self.save_dir = save_dir
        self.state_dir = os.path.join(save_dir, "state") if save_dir else None
        self._pending = None
        self._executor = None
        if self.save_dir is not None and jax.process_index() == 0:
            os.makedirs(self.save_dir, exist_ok=True)
            if async_save:
                from concurrent.futures import ThreadPoolExecutor

                self._executor = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="ckpt"
                )

    def __call__(self, model, train_state, step: int):
        if self.save_dir is None:
            return
        self.wait()  # one in-flight save at a time
        # snapshot to host BEFORE the loop donates these buffers
        params = jax.device_get(train_state.params)
        payload = {
            "step": int(train_state.step),
            "params": params,
            "opt_state": jax.device_get(train_state.opt_state),
            "rng": np.asarray(train_state.rng),
            "ema_params": jax.device_get(train_state.ema_params),
        }

        def write():
            model.replace(params=params).save_pretrained(
                step=step, checkpoint_path=self.save_dir
            )
            if payload["ema_params"] is not None and jax.process_index() == 0:
                step_dir = os.path.join(self.save_dir, str(step))
                os.makedirs(step_dir, exist_ok=True)
                with open(os.path.join(step_dir, "EMA_params.pkl"), "wb") as f:
                    pickle.dump({"EMA_0.999": payload["ema_params"]}, f)
            # latest-only full train-state checkpoint for resumption;
            # write-then-rename so a crash never corrupts the resume point
            if jax.process_index() == 0:
                os.makedirs(self.state_dir, exist_ok=True)
                state_path = os.path.join(self.state_dir, "latest.pkl")
                tmp_path = state_path + ".tmp"
                with open(tmp_path, "wb") as f:
                    pickle.dump(payload, f)
                os.replace(tmp_path, state_path)
                logging.info(
                    f"Saved checkpoint at step {step} to {self.save_dir}"
                )

        if self._executor is not None:
            self._pending = self._executor.submit(write)
        else:
            write()

    def wait(self):
        """Blocks until any in-flight save lands (re-raises its errors)."""
        if self._pending is not None:
            self._pending.result()
            self._pending = None

    def restore(self, train_state):
        """Restores the latest full TrainState, if present."""
        self.wait()
        state_path = os.path.join(self.state_dir, "latest.pkl")
        if not os.path.exists(state_path):
            return train_state, None
        with open(state_path, "rb") as f:
            payload = pickle.load(f)
        restored = train_state.replace(
            step=jnp.asarray(payload["step"], jnp.int32),
            params=payload["params"],
            opt_state=payload["opt_state"],
            rng=jnp.asarray(payload["rng"]),
            ema_params=payload["ema_params"],
        )
        return restored, payload["step"]


class VisualizationCallback:
    """Offline manipulation metrics + action-vs-prediction plots on held-out
    trajectories (parity: octo/utils/train_callbacks.py VisualizationCallback).

    visualizers: {name: hypervla_tpu.eval.visualization.Visualizer} over
    chunked-trajectory validation datasets.
    """

    def __init__(
        self,
        model,
        text_encode: Callable,
        visualizers: dict,
        n_trajs: int = 4,
        use_initial_image: bool = False,
        dino_encode: Optional[Callable] = None,
        make_plots: bool = False,
    ):
        self.model = model
        self.text_encode = text_encode
        self.visualizers = visualizers
        self.n_trajs = n_trajs
        self.use_initial_image = use_initial_image
        self.dino_encode = dino_encode
        self.make_plots = make_plots

    def _policy_fn(self, params, step: int):
        model = self.model.replace(params=params)

        def policy(observations, tasks):
            instr = {
                k: np.asarray(v)[:1]
                for k, v in tasks["language_instruction"].items()
            }
            if "token_embedding" not in instr:
                instr["token_embedding"] = np.asarray(
                    self.text_encode(
                        instr["input_ids"], instr["attention_mask"]
                    )
                )
            instruction_dict = {"language_instruction": instr}
            initial_state = None
            if self.use_initial_image and "initial_state" in tasks:
                initial_state = {
                    k: np.asarray(v)[:1]
                    for k, v in tasks["initial_state"].items()
                }
                if (
                    "patch_embeddings" not in initial_state
                    and self.dino_encode is not None
                ):
                    initial_state["patch_embeddings"] = np.asarray(
                        self.dino_encode(
                            initial_state["image_primary"].squeeze(1)
                        )
                    )
            base_params, hn_tasks, _ = model.create_tasks(
                instruction_dict=instruction_dict, initial_state=initial_state
            )
            images = np.asarray(observations["image_primary"])
            num_frames = images.shape[0]
            pad = np.asarray(observations["timestep_pad_mask"])
            frame_instr = {
                "language_instruction": {
                    k: np.broadcast_to(v, (num_frames,) + v.shape[1:])
                    for k, v in instr.items()
                }
            }
            action, _ = model.sample_actions(
                images,
                frame_instr,
                hn_tasks,
                pad,
                base_params,
                rng=jax.random.PRNGKey(step),
            )
            return np.asarray(action)

        return policy

    def __call__(self, params, step: int) -> dict:
        metrics = {}
        for name, viz in self.visualizers.items():
            policy_fn = self._policy_fn(params, step)
            for k, v in viz.metrics_for_wandb(
                policy_fn, n_trajs=self.n_trajs
            ).items():
                metrics[f"visualizer/{name}/{k}"] = v
            if self.make_plots:
                for k, fig in viz.visualize_for_wandb(
                    policy_fn, n_trajs=min(2, self.n_trajs)
                ).items():
                    metrics[f"visualizer/{name}/{k}"] = fig
        return metrics


class RolloutCallback:
    """Closed-loop sim rollouts during training (parity:
    octo/utils/train_callbacks.py RolloutVisualizationCallback). Gated on the
    env being constructible — in environments without the simulators this
    degrades to a no-op with a logged warning.
    """

    def __init__(self, rollout_visualizers, policy_fn_builder,
                 n_rollouts: int = 5):
        """rollout_visualizers: list of eval.visualization.RolloutVisualizer.
        policy_fn_builder(params) -> policy_fn(stacked_obs) -> action chunk."""
        self.rollout_visualizers = rollout_visualizers
        self.policy_fn_builder = policy_fn_builder
        self.n_rollouts = n_rollouts

    def __call__(self, params, step: int) -> dict:
        metrics = {}
        policy_fn = self.policy_fn_builder(params)
        for rv in self.rollout_visualizers:
            try:
                m, _ = rv.run_rollouts(policy_fn, n_rollouts=self.n_rollouts)
                metrics.update(m)
            except Exception as e:  # sim not installed / env died
                logging.warning(f"rollout {rv.name} skipped: {e!r}")
        return metrics


class ValidationCallback:
    def __init__(
        self,
        model,
        text_encode: Optional[Callable],
        val_iterators: dict,
        num_val_batches: int = 8,
        use_initial_image: bool = False,
        dino_encode: Optional[Callable] = None,
    ):
        self.model = model
        self.val_iterators = val_iterators
        self.num_val_batches = num_val_batches
        self.text_encode = text_encode
        self.dino_encode = dino_encode
        self.use_initial_image = use_initial_image
        self._val_loss = jax.jit(self._make_val_loss())

    def _make_val_loss(self):
        model = self.model
        use_initial_image = self.use_initial_image
        generation_flag = model.hypernet.base_net_metadata["generation_flag"]

        def val_loss(params, batch, rng):
            hypernet_rng, base_net_rng = jax.random.split(rng)
            initial_states = (
                batch["initial_state"] if use_initial_image else None
            )
            dict_base_params, _ = model.hypernet.apply(
                {"params": params},
                batch["task"],
                train=False,
                initial_states=initial_states,
                rngs={"dropout": hypernet_rng},
                broadcast_shared=False,
            )
            import flax

            dict_base_params = flax.core.unfreeze(dict_base_params)

            def per_sample_predict(base_params, sample, dropout_rng):
                sample = jax.tree_util.tree_map(
                    lambda x: jnp.expand_dims(x, 0), sample
                )
                from hypervla_tpu.models.base_network import BaseNetwork

                return model.base_net.apply(
                    {"params": base_params},
                    sample["observation"]["image_primary"],
                    sample["task"]["language_instruction"]["token_embedding"],
                    sample["observation"]["timestep_pad_mask"],
                    train=False,
                    rng=dropout_rng,
                    rngs={"dropout": dropout_rng},
                    method=BaseNetwork.predict_action,
                )

            dropout_rngs = jax.random.split(base_net_rng,
                                            batch["action"].shape[0])
            # shared params have no batch axis: vmap closes over them
            param_axes = jax.tree_util.tree_map(
                lambda gen: 0 if gen else None, generation_flag
            )
            predicted = jax.vmap(
                per_sample_predict, in_axes=(param_axes, 0, 0)
            )(dict_base_params, batch, dropout_rngs)
            target = jnp.clip(batch["action"], -5.0, 5.0)
            action_dim = target.shape[-1]
            # predicted has a leading per-sample batch dim of 1
            predicted = predicted.reshape(target[:, -1].shape)
            mse = ((predicted - target[:, -1]) ** 2).mean() * action_dim
            return mse

        return val_loss

    def __call__(self, params, step: int, rng=None) -> dict:
        rng = rng if rng is not None else jax.random.PRNGKey(step)
        metrics = {}
        for name, iterator in self.val_iterators.items():
            losses = []
            for _ in range(self.num_val_batches):
                try:
                    batch = next(iterator)
                except StopIteration:
                    break
                if self.text_encode is not None:
                    emb = self.text_encode(
                        batch["task"]["language_instruction"]["input_ids"],
                        batch["task"]["language_instruction"]["attention_mask"],
                    )
                    batch["task"]["language_instruction"]["token_embedding"] = emb
                if self.use_initial_image and self.dino_encode is not None:
                    batch["initial_state"]["patch_embeddings"] = (
                        self.dino_encode(
                            batch["initial_state"]["image_primary"].squeeze(1)
                        )
                    )
                rng, key = jax.random.split(rng)
                losses.append(float(self._val_loss(params, batch, key)))
            if losses:
                metrics[f"validation/{name}/mse"] = float(np.mean(losses))
        return metrics
