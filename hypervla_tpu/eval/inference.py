"""Closed-loop inference runtime (parity: data/utils/hypervla_interface.py).

The per-episode flow: `reset` runs ONE hypernet forward (create_tasks) and
caches the generated base-net params on device; `step` runs only the tiny
base net per control tick, then un-normalizes, optionally ensembles, and
applies the per-robot gripper/rotation post-processing (google-robot sticky
gripper, widowx binarization, libero rescale).

Image preprocessing matches training (lanczos3 resize, optional sqrt(0.9)
center crop-and-resize, optional 256x320 padded resize) but runs through the
fused JAX ops instead of per-step TF CPU kernels.
"""
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypervla_tpu.data.data_utils import NormalizationType
from hypervla_tpu.eval.action_ensemble import ActionEnsembler
from hypervla_tpu.eval.action_space import euler2axangle
from hypervla_tpu.ops import preprocess


class InferenceWrapper:
    def __init__(
        self,
        model=None,
        policy_setup: str = "libero",
        horizon: int = 1,
        pred_action_horizon: int = 1,
        exec_horizon: int = 1,
        image_size: int = 256,
        init_rng: int = 0,
        action_ensemble: bool = False,
        crop: bool = False,
        save_attention_map: bool = False,
        padded_resize: bool = False,
        fused_serving: bool = False,
        trunk_kernel: "bool | str" = False,
        pack_args: bool = False,
    ) -> None:
        self.model = model
        self.policy_setup = policy_setup
        self.image_size = image_size
        self.horizon = horizon
        self.pred_action_horizon = pred_action_horizon
        self.exec_horizon = exec_horizon
        self.action_ensemble = action_ensemble
        self.action_ensemble_temp = 0.0
        self.padded_resize = padded_resize
        self.rng = jax.random.PRNGKey(init_rng)
        for _ in range(5):
            # match the reference server's rng stream
            self.rng, _ = jax.random.split(self.rng)

        if policy_setup == "google_robot":
            self.sticky_gripper_num_repeat = 15
            dataset = "fractal20220817_data"
        elif policy_setup == "widowx_bridge":
            self.sticky_gripper_num_repeat = 1
            dataset = "bridge_dataset"
        elif policy_setup == "libero":
            dataset = "libero"
        elif policy_setup == "metaworld":
            dataset = "metaworld"
        else:
            raise ValueError(f"Unknown policy setup: {policy_setup}")

        self.sticky_action_is_on = False
        self.gripper_action_repeat = 0
        self.sticky_gripper_action = 0.0
        self.previous_gripper_action = None

        self.task = None
        self.task_description = None
        self.image_history = deque(maxlen=self.horizon)
        self.action_ensembler = (
            ActionEnsembler(self.pred_action_horizon, self.action_ensemble_temp)
            if self.action_ensemble
            else None
        )
        self.num_image_history = 0
        self.crop = crop
        self.save_attention_map = save_attention_map
        # fused_serving: resize/crop + base net + unnormalize + ensembling in
        # ONE jitted program (ops/serving.py). Requires horizon == 1, no
        # attention capture, google/widowx/libero post-processing still on host
        self.fused_serving = (
            fused_serving
            and horizon == 1
            and not save_attention_map
            and not padded_resize
        )
        self._serving_step = None
        self._serving_history = None
        # run the DINOv2 trunk over pre-stacked layer weights (TPU, bs=1,
        # DINOv2-base only): "scan"/True = XLA lax.scan twin (default when
        # truthy — no cold-start program-load stall, PERF.md round 5);
        # "pallas" = the Pallas weight-streaming kernel (ops/dino_layer.py;
        # −1.5% steady state vs scan but 492-583 s first execution when the
        # backend's program cache is cold)
        if not (trunk_kernel and self.fused_serving):
            self.trunk_kernel = False
        elif trunk_kernel is True:
            self.trunk_kernel = "scan"
        else:
            # unrecognized strings raise — a typo must not silently
            # benchmark a different trunk engine (ops/serving.py)
            from hypervla_tpu.ops.serving import resolve_trunk_impl

            self.trunk_kernel = {
                "pallas_serving": "pallas", "scan_serving": "scan",
                "unroll_serving": "unroll",
            }[resolve_trunk_impl(trunk_kernel)]
        # pack tiny param leaves into per-dtype flat buffers once per
        # episode so each control tick dispatches a handful of handles
        # (ops/serving.py::make_arg_packer)
        self.pack_args = bool(pack_args and self.fused_serving)

        if model is not None and model.dataset_statistics is not None:
            if "action" in model.dataset_statistics:
                self.unnormalization_statistics = model.dataset_statistics[
                    "action"
                ]
            elif dataset in model.dataset_statistics:
                self.unnormalization_statistics = model.dataset_statistics[
                    dataset
                ]["action"]
            else:
                fallback = sorted(model.dataset_statistics.keys())[0]
                import logging

                logging.warning(
                    f"No statistics for {dataset}; falling back to "
                    f"{fallback} statistics."
                )
                self.unnormalization_statistics = model.dataset_statistics[
                    fallback
                ]["action"]
            self.normalization_type = _find_normalization_type(
                model.config, dataset
            )

    # ------------------------------ images ------------------------------

    def _resize_image(self, image: np.ndarray) -> np.ndarray:
        x = jnp.asarray(image)
        if self.padded_resize:
            x = _resize_with_pad(x, 256, 320)
        x = preprocess.resize_image(x, (self.image_size, self.image_size))
        if self.crop:
            scale = np.sqrt(0.9)
            offset = (1 - scale) / 2
            x = _crop_and_resize_bilinear(
                x.astype(jnp.float32),
                (offset, offset, offset + scale, offset + scale),
                (self.image_size, self.image_size),
            )
            x = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
        return np.asarray(x)

    def _add_image_to_history(self, image: np.ndarray) -> None:
        self.image_history.append(image)
        self.num_image_history = min(self.num_image_history + 1, self.horizon)

    def _obtain_image_history_and_mask(self):
        images = np.stack(self.image_history, axis=0)
        horizon = len(self.image_history)
        pad_mask = np.ones(horizon, dtype=np.float64)
        pad_mask[: horizon - min(horizon, self.num_image_history)] = 0
        return images, pad_mask

    # ------------------------------ control ------------------------------

    def reset(self, task_description: str, instruction_dict,
              initial_state=None) -> None:
        self.base_params, self.task, _ = self.model.create_tasks(
            instruction_dict=instruction_dict, initial_state=initial_state
        )
        from hypervla_tpu.ops.serving import prepare_serving_params

        # once per episode: bake the DINOv2 pos-grid interpolation for this
        # resolution (exact) and, on a bf16 trunk, store shared weights bf16
        self.base_params = prepare_serving_params(
            self.model, self.base_params, image_size=self.image_size
        )
        if self.trunk_kernel:
            from hypervla_tpu.ops.serving import make_pallas_trunk_net

            # per episode: stack the trunk into the kernel layout; the
            # serving step then consumes the variables dict directly
            from hypervla_tpu.ops.serving import resolve_trunk_impl

            _, self.base_params = make_pallas_trunk_net(
                self.model, self.base_params,
                impl=resolve_trunk_impl(self.trunk_kernel),
            )
        self.instruction_dict = instruction_dict
        if self.fused_serving:
            if self._serving_step is None:
                from hypervla_tpu.ops.serving import make_serving_step

                self._serving_step, init_history = make_serving_step(
                    self.model,
                    self.unnormalization_statistics,
                    normalization_type=str(
                        NormalizationType(self.normalization_type).value
                    ),
                    image_size=self.image_size,
                    crop=self.crop,
                    ensemble_temp=self.action_ensemble_temp,
                    ensemble=self.action_ensemble,
                    trunk_kernel=self.trunk_kernel,
                    pack_args=self.pack_args,
                )
                self._init_history = init_history
            if self.pack_args:
                # fold the episode constants (token embedding, rng) into the
                # per-dtype flat buffers: a tick then dispatches ~5 handles
                self.rng, episode_key = jax.random.split(self.rng)
                self.base_params = self._serving_step.pack_params(
                    self.base_params,
                    self.instruction_dict["language_instruction"][
                        "token_embedding"
                    ],
                    episode_key,
                )
            self._serving_history = self._init_history()
        self.task_description = task_description
        self.image_history.clear()
        if self.action_ensemble:
            self.action_ensembler.reset()
        self.num_image_history = 0
        self.sticky_action_is_on = False
        self.gripper_action_repeat = 0
        self.sticky_gripper_action = 0.0
        self.previous_gripper_action = None
        self.episode_step = 0

    def step(self, image: np.ndarray, task_description: Optional[str] = None,
             image_embeddings=None, *args, **kwargs):
        if task_description is not None and task_description != self.task_description:
            self.reset(task_description, self.instruction_dict)

        assert image.dtype == np.uint8
        if self.fused_serving:
            return self._fused_step(image)
        image = self._resize_image(image)
        self._add_image_to_history(image)
        images, pad_mask = self._obtain_image_history_and_mask()
        images, pad_mask = images[None], pad_mask[None]

        self.rng, key = jax.random.split(self.rng)

        start = time.time()
        raw_actions, intermediate_states = self.model.sample_actions(
            images,
            self.instruction_dict,
            self.task,
            pad_mask,
            self.base_params,
            rng=key,
            image_embeddings=image_embeddings,
        )
        end = time.time()
        raw_actions = raw_actions[0]

        if self.save_attention_map:
            self._extract_attention_maps(intermediate_states)

        raw_actions = self._unnormalize(raw_actions)

        assert raw_actions.shape == (self.pred_action_horizon, 7)
        if self.action_ensemble:
            raw_action = self.action_ensembler.ensemble_action(raw_actions)
        else:
            raw_action = np.array(raw_actions[0])

        action = self._postprocess(raw_action)
        self.episode_step += 1
        return raw_action, action, image, (self.task_description, self.task), (
            end - start
        )

    def _fused_step(self, image: np.ndarray):
        """One device round-trip per tick via ops/serving.py."""
        import time as _time

        start = _time.time()
        if self.pack_args:
            raw_action, self._serving_history = self._serving_step(
                self.base_params,
                jnp.asarray(image),
                self._serving_history,
                self.episode_step,
            )
        else:
            self.rng, key = jax.random.split(self.rng)
            raw_action, self._serving_history = self._serving_step(
                self.base_params,
                jnp.asarray(image),
                self.instruction_dict["language_instruction"][
                    "token_embedding"
                ],
                self._serving_history,
                self.episode_step,
                key,
            )
        raw_action = np.asarray(raw_action)
        end = _time.time()
        action = self._postprocess(raw_action)
        self.episode_step += 1
        return raw_action, action, image, (self.task_description, self.task), (
            end - start
        )

    # --------------------------- postprocessing ---------------------------

    def _unnormalize(self, raw_actions):
        stats = self.unnormalization_statistics
        if NormalizationType(self.normalization_type) == NormalizationType.NORMAL:
            mask = np.asarray(
                stats.get("mask", np.ones_like(stats["mean"], dtype=bool))
            )
            raw_actions = np.asarray(raw_actions)[..., : len(mask)]
            return np.where(
                mask,
                raw_actions * np.asarray(stats["std"])
                + np.asarray(stats["mean"]),
                raw_actions,
            )
        elif NormalizationType(self.normalization_type) == NormalizationType.BOUNDS:
            mask = np.asarray(
                stats.get("mask", np.ones_like(stats["p01"], dtype=bool))
            )
            raw_actions = np.asarray(raw_actions)[..., : len(mask)]
            p01 = np.asarray(stats["p01"])
            p99 = np.asarray(stats["p99"])
            return np.where(
                mask,
                (raw_actions + 1) * (p99 - p01 + 1e-8) / 2 + p01,
                raw_actions,
            )
        raise ValueError(f"Unknown normalization type {self.normalization_type}")

    def _postprocess(self, raw_action):
        if self.policy_setup == "metaworld":
            action = raw_action.copy()
            action[-1] = 1 - action[-1]
            return action

        action = {}
        action["world_vector"] = raw_action[:3]
        roll, pitch, yaw = np.asarray(raw_action[3:6], dtype=np.float64)
        ax, angle = euler2axangle(roll, pitch, yaw)
        action["rot_axangle"] = ax * angle

        if self.policy_setup == "google_robot":
            current_gripper_action = float(raw_action[-1])
            if self.previous_gripper_action is None:
                relative_gripper_action = 0
            else:
                relative_gripper_action = (
                    self.previous_gripper_action - current_gripper_action
                )  # google robot: 1 = close, -1 = open
            self.previous_gripper_action = current_gripper_action

            if (
                np.abs(relative_gripper_action) > 0.5
                and self.sticky_action_is_on is False
            ):
                self.sticky_action_is_on = True
                self.sticky_gripper_action = relative_gripper_action
            if self.sticky_action_is_on:
                self.gripper_action_repeat += 1
                relative_gripper_action = self.sticky_gripper_action
            if self.gripper_action_repeat == self.sticky_gripper_num_repeat:
                self.sticky_action_is_on = False
                self.gripper_action_repeat = 0
                self.sticky_gripper_action = 0.0
            action["gripper"] = relative_gripper_action
        elif self.policy_setup == "widowx_bridge":
            action["gripper"] = 2.0 * (raw_action[-1] > 0.5) - 1.0
        elif self.policy_setup == "libero":
            action["gripper"] = 2 * raw_action[-1] - 1

        return np.concatenate(
            [
                action["world_vector"],
                action["rot_axangle"].astype(np.float32),
                np.array([action["gripper"]]).astype(np.float32),
            ]
        )

    def _extract_attention_maps(self, intermediate_states):
        inter = intermediate_states["intermediates"]["encoder"]
        dino = inter.get("DINO_attention_map")
        if dino is not None:
            dino = dino[0]
            self.dino_attention_map = np.stack(
                [np.asarray(x)[0, :, 0, 1:] for x in dino]
            )
        tf_inter = inter.get("Transformer_0", {})
        maps = []
        for i in range(self.model.config["base_net_kwargs"]["vit_kwargs"][
            "num_layers"
        ]):
            block = tf_inter.get(f"encoderblock_{i}", {})
            for key in ("attention_map", "attention_weights"):
                if key in block:
                    maps.append(np.asarray(block[key][0])[0, :, -1, :-1])
                    break
            else:
                for sub in block.values():
                    if isinstance(sub, dict) and "attention_weights" in sub:
                        maps.append(
                            np.asarray(sub["attention_weights"][0])[0, :, -1, :-1]
                        )
                        break
        if maps:
            self.head_attention_map = np.stack(maps)


def _find_normalization_type(config, dataset):
    dk = config.get("dataset_kwargs", {})
    if "dataset_kwargs" in dk:
        return dk["dataset_kwargs"]["action_proprio_normalization_type"]
    for dataset_config in dk.get("dataset_kwargs_list", []):
        if dataset_config["name"] == dataset:
            return dataset_config["action_proprio_normalization_type"]
    return NormalizationType.NORMAL


def _resize_with_pad(image, target_height, target_width):
    """tf.image.resize_with_pad semantics: scale preserving aspect then pad."""
    h, w = image.shape[-3], image.shape[-2]
    scale = min(target_height / h, target_width / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(
        image.astype(jnp.float32),
        (*image.shape[:-3], new_h, new_w, image.shape[-1]),
        method="bilinear",
    )
    pad_top = (target_height - new_h) // 2
    pad_left = (target_width - new_w) // 2
    pads = [(0, 0)] * (image.ndim - 3) + [
        (pad_top, target_height - new_h - pad_top),
        (pad_left, target_width - new_w - pad_left),
        (0, 0),
    ]
    return jnp.pad(resized, pads)


def _crop_and_resize_bilinear(image, box, size):
    """tf.image.crop_and_resize for a single image + normalized box."""
    y1, x1, y2, x2 = box
    h, w = image.shape[-3], image.shape[-2]
    out_h, out_w = size
    scale_y = (y2 - y1) * (h - 1) / max(out_h - 1, 1)
    scale_x = (x2 - x1) * (w - 1) / max(out_w - 1, 1)
    return jax.image.scale_and_translate(
        image,
        shape=(*image.shape[:-3], out_h, out_w, image.shape[-1]),
        spatial_dims=(image.ndim - 3, image.ndim - 2),
        scale=jnp.array([1.0 / scale_y, 1.0 / scale_x]),
        translation=jnp.array(
            [-y1 * (h - 1) / scale_y, -x1 * (w - 1) / scale_x]
        ),
        method="bilinear",
        antialias=False,
    )
