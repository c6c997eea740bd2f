"""SIMPLER closed-loop evaluation driver (parity: data/simpler/evaluate.py).

Import-gated: the SIMPLER/ManiSkill2 simulators are x86/GPU-bound and not
installable on TPU hosts, so this module (a) runs locally when `simpler_env`
is importable, or (b) drives a remote policy server (eval/policy_server.py)
from the sim machine with `--policy_server host:port`.

Task table (episode counts) matches the reference's zero-shot protocol:
3 drawer tasks x20, pick x50, move_near x60, 4 WidowX tasks x20.
"""
import argparse
import json
import logging
import os
from typing import Optional

import numpy as np

SIMPLER_TASKS = {
    "google_robot_close_top_drawer": (None, 20, None),
    "google_robot_close_middle_drawer": (None, 20, None),
    "google_robot_close_bottom_drawer": (None, 20, None),
    "google_robot_pick_object": (None, 50, None),
    "google_robot_move_near": (
        None,
        60,
        [{"obj_init_options": {"episode_id": i}} for i in range(60)],
    ),
    "widowx_spoon_on_towel": (None, 20, None),
    "widowx_carrot_on_plate": (None, 20, None),
    "widowx_stack_cube": (None, 20, None),
    "widowx_put_eggplant_in_basket": (None, 20, None),
}


def policy_setup_for_task(task_name: str) -> str:
    return "google_robot" if "google_robot" in task_name else "widowx_bridge"


def evaluate(
    policy,
    text_encode,
    tasks=SIMPLER_TASKS,
    seed: int = 0,
    eval_path: str = "eval_results/simpler",
    save_file_name: str = "success_rate",
    save_video: bool = False,
    recompute: bool = False,
    max_steps_override: Optional[int] = None,
    save_attention_map: bool = False,
):
    """Runs the closed-loop SIMPLER evaluation.

    policy: InferenceWrapper-like object (reset/step) OR a PolicyClient.
    text_encode: str -> instruction dict (ignored for PolicyClient).
    """
    import simpler_env
    from simpler_env.utils.env.observation_utils import (
        get_image_from_maniskill2_obs_dict,
    )

    os.makedirs(eval_path, exist_ok=True)
    results_file = os.path.join(eval_path, f"{save_file_name}.json")
    all_tasks_success_rate = {}
    if os.path.exists(results_file):
        with open(results_file) as f:
            all_tasks_success_rate = json.load(f)

    for task_name, (_, num_episodes, task_options) in tasks.items():
        if task_name in all_tasks_success_rate and not recompute:
            continue
        env = simpler_env.make(task_name)
        successes = []
        inference_times = []
        sim_times = []
        import time

        for episode in range(num_episodes):
            options = (
                task_options[episode % len(task_options)]
                if task_options
                else None
            )
            obs, reset_info = env.reset(
                seed=seed + episode, options=options or {}
            )
            instruction = env.get_language_instruction()
            image = get_image_from_maniskill2_obs_dict(env, obs)

            if hasattr(policy, "reset") and text_encode is not None:
                instruction_dict = text_encode(instruction)
                initial_state = _initial_state(policy, image)
                policy.reset(instruction, instruction_dict,
                             initial_state=initial_state)
            else:  # PolicyClient
                policy.reset(instruction)

            done, truncated = False, False
            success = False
            steps = 0
            frames = [image] if save_video else None
            attention_maps = [] if save_attention_map else None
            max_steps = max_steps_override or env.spec.max_episode_steps or 300
            while not (done or truncated) and steps < max_steps:
                t0 = time.time()
                if hasattr(policy, "step") and text_encode is not None:
                    _, action, _, attn, model_time = policy.step(image)
                    inference_times.append(model_time)
                    if attention_maps is not None and attn is not None:
                        attention_maps.append(np.asarray(attn))
                else:
                    reply = policy.step(image)
                    action = reply["action"]
                    inference_times.append(reply["model_time"])
                t1 = time.time()
                obs, reward, done, truncated, info = env.step(action)
                sim_times.append(time.time() - t1)
                image = get_image_from_maniskill2_obs_dict(env, obs)
                if frames is not None:
                    frames.append(image)
                success = success or bool(done)
                steps += 1
            successes.append(float(success))
            if frames is not None:
                _write_video(
                    os.path.join(
                        eval_path,
                        f"{task_name}_ep{episode}_{'succ' if success else 'fail'}",
                    ),
                    frames,
                )
            if attention_maps:
                # parity: the reference pickles per-episode attention maps
                # (data/simpler/evaluate.py:358-401)
                import pickle

                with open(
                    os.path.join(
                        eval_path, f"{task_name}_ep{episode}_attention.pkl"
                    ),
                    "wb",
                ) as f:
                    pickle.dump(np.stack(attention_maps), f)
            logging.info(
                f"{task_name} ep {episode}: success={success} "
                f"(avg model {np.mean(inference_times)*1000:.1f} ms, "
                f"sim {np.mean(sim_times)*1000:.1f} ms)"
            )
        env.close()
        all_tasks_success_rate[task_name] = float(np.mean(successes))
        with open(results_file, "w") as f:
            json.dump(all_tasks_success_rate, f)
    return all_tasks_success_rate


def _write_video(path_base: str, frames):
    """Saves rollout frames (parity: the reference's mediapy MP4 export).
    Uses imageio/mediapy when available, else PIL GIF, else a .npz dump."""
    import numpy as np

    arr = np.stack([np.asarray(f) for f in frames])
    try:
        import mediapy

        mediapy.write_video(path_base + ".mp4", arr, fps=10)
        return
    except Exception:  # missing package or no ffmpeg backend
        pass
    try:
        import imageio

        imageio.mimsave(path_base + ".mp4", arr, fps=10)
        return
    except Exception:
        pass
    try:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in arr]
        imgs[0].save(
            path_base + ".gif", save_all=True, append_images=imgs[1:],
            duration=100, loop=0,
        )
        return
    except ImportError:
        np.savez_compressed(path_base + ".npz", frames=arr)


def _initial_state(policy, image):
    """Builds the initial-state dict (DINO patch embeddings of the first
    frame) when the model was trained with initial-image conditioning."""
    model = getattr(policy, "model", None)
    if model is None or not model.config["hypernet_kwargs"].get(
        "use_initial_image", False
    ):
        return None
    import jax
    import jax.numpy as jnp

    from hypervla_tpu.models.base_vit import DINO_IMAGE_MEAN, DINO_IMAGE_STD
    from hypervla_tpu.models.encoders.dinov2 import DINOv2Model, dinov2_config
    from hypervla_tpu.models.encoders.pretrained import (
        _find_msgpack,
        _load_msgpack,
    )
    from hypervla_tpu.ops import preprocess

    name = model.config["base_net_kwargs"]["vit_kwargs"].get(
        "pretrained_encoder_name", "dinov2-base"
    )
    if not hasattr(policy, "_dino_encode"):
        dino = DINOv2Model(config=dinov2_config(name))
        path = _find_msgpack(name)
        if path is not None:
            params = {"params": _load_msgpack(path)}
        else:
            params = dino.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
            )

        @jax.jit
        def encode(images):
            raw = images.astype(jnp.float32) / 255.0
            mean = jnp.array(DINO_IMAGE_MEAN)
            std = jnp.array(DINO_IMAGE_STD)
            raw = (raw - mean[None, None, None]) / std[None, None, None]
            return dino.apply(params, raw).last_hidden_state

        policy._dino_encode = encode

    resized = np.asarray(
        preprocess.resize_image(jnp.asarray(image), (224, 224))
    )
    patches = np.asarray(policy._dino_encode(resized[None]))
    return {
        "image_primary": resized[None, None],
        "patch_embeddings": patches,
    }


def main():
    parser = argparse.ArgumentParser(description="SIMPLER zero-shot evaluation")
    parser.add_argument(
        "--model",
        choices=["hypervla", "base_net", "octo"],
        default="hypervla",
    )
    parser.add_argument("--model_path", type=str, default="")
    parser.add_argument("--seeds", type=str, default="0+1+2+3")
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--action_ensemble", action="store_true")
    parser.add_argument("--save_video", action="store_true")
    parser.add_argument("--save_attention_map", action="store_true")
    parser.add_argument("--recompute", action="store_true")
    parser.add_argument("--window_size", type=int, default=2)
    parser.add_argument("--crop", action="store_true")
    parser.add_argument("--EMA", type=float, default=None)
    parser.add_argument(
        "--policy_server",
        type=str,
        default=None,
        help="host:port of a TPU-side policy server; when set, the model "
        "runs remotely and this process only drives the simulator",
    )
    args = parser.parse_args()

    seeds = [int(s) for s in args.seeds.split("+")]
    for seed in seeds:
        if args.policy_server:
            from hypervla_tpu.eval.policy_server import PolicyClient

            host, port = args.policy_server.split(":")
            policy = PolicyClient(host, int(port))
            text_encode = None
        else:
            from hypervla_tpu.eval.model_loading import (
                build_text_encoder,
                load_hypervla_policy,
            )

            policy = load_hypervla_policy(
                args.model_path,
                step=args.step,
                action_ensemble=args.action_ensemble,
                crop=args.crop,
                ema_decay=args.EMA,
                horizon=args.window_size,
            )
            text_encode = build_text_encoder(policy.model)
        evaluate(
            policy,
            text_encode,
            seed=seed,
            eval_path=f"eval_results/simpler/{args.model}/{seed}",
            recompute=args.recompute,
            save_attention_map=args.save_attention_map,
            save_video=args.save_video,
        )


if __name__ == "__main__":
    main()
