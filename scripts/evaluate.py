"""Evaluation orchestrator (parity: scripts/evaluate.py): fans out per-seed
SIMPLER / LIBERO evaluation runs."""
import argparse
import os


def evaluate_simpler(method, folder, step_num, window_size=1, seed_num=3,
                     save_video=False, recompute=False, action_ensemble=True,
                     crop=False, parallel_eval=False, EMA=None,
                     policy_server=None):
    for seed in range(seed_num):
        command = (
            f"python -m hypervla_tpu.eval.simpler --model {method} "
            f"--model_path {folder} --step {step_num} "
            f"--window_size {window_size} --seeds {seed}"
        )
        if action_ensemble:
            command += " --action_ensemble"
        if save_video:
            command += " --save_video"
        if recompute:
            command += " --recompute"
        if crop:
            command += " --crop"
        if EMA is not None:
            command += f" --EMA {EMA}"
        if policy_server:
            command += f" --policy_server {policy_server}"
        os.system(f"{command} &" if parallel_eval else command)


def evaluate_libero(folder, step_num, benchmark="libero_object", seed_num=1,
                    recompute=False, EMA=0.999, policy_server=None):
    for seed in range(seed_num):
        command = (
            f"python -m hypervla_tpu.eval.libero --model_path {folder} "
            f"--step {step_num} --benchmark {benchmark} --seeds {seed} "
            f"--EMA {EMA}"
        )
        if recompute:
            command += " --recompute"
        if policy_server:
            command += f" --policy_server {policy_server}"
        os.system(command)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", type=str, default="simpler")
    parser.add_argument("--method", type=str, default="hypervla")
    parser.add_argument("--folder", type=str, default="")
    parser.add_argument("--step_num", type=int, default=100000)
    parser.add_argument("--seed_num", type=int, default=3)
    parser.add_argument("--save_video", action="store_true")
    parser.add_argument("--window_size", type=int, default=2)
    parser.add_argument("--recompute", action="store_true")
    parser.add_argument("--action_ensemble", action="store_true")
    parser.add_argument("--crop", action="store_true")
    parser.add_argument("--parallel_eval", action="store_true")
    parser.add_argument("--EMA", type=float, default=None)
    parser.add_argument("--policy_server", type=str, default=None,
                        help="host:port of a TPU policy server")
    args = parser.parse_args()

    if args.benchmark == "simpler":
        evaluate_simpler(
            args.method, args.folder, args.step_num,
            window_size=args.window_size, seed_num=args.seed_num,
            save_video=args.save_video, recompute=args.recompute,
            action_ensemble=args.action_ensemble, crop=args.crop,
            parallel_eval=args.parallel_eval, EMA=args.EMA,
            policy_server=args.policy_server,
        )
    else:
        evaluate_libero(
            args.folder, args.step_num, benchmark=args.benchmark,
            seed_num=args.seed_num, recompute=args.recompute,
            EMA=args.EMA if args.EMA is not None else 0.999,
            policy_server=args.policy_server,
        )
