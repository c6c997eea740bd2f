"""Profile the bs=1 closed-loop serving step and print the top device ops.

Builds the flagship serving program exactly as bench.py does (generated
base-net step over the bf16 DINOv2-base trunk), traces a few steps with
jax.profiler, and prints the per-op device-time breakdown via the in-repo
TensorBoard-free xplane parser — the tool that produced the round-1/2
"Serving-step device profile" sections of PERF.md.

Usage: python -m scripts.profile_serving [--top 30] [--fused-ln]
"""
import argparse
import glob
import shutil
import tempfile

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--ln", type=str, default=None,
                    help="A/B: LayerNorm impl — 'pallas' (single-pass "
                         "kernel) or 'dot' (MXU ones-dot statistics)")
    ap.add_argument("--trunk-kernel", action="store_true",
                    help="A/B: run the DINO trunk as the Pallas "
                         "weight-streaming kernel (ops/dino_layer.py)")
    args = ap.parse_args()

    from hypervla_tpu.flagship import build_flagship
    from hypervla_tpu.models.base_network import BaseNetwork
    from hypervla_tpu.ops.serving import prepare_serving_params
    from hypervla_tpu.utils.xplane import module_time_ms, summarize

    overrides = {}
    if args.ln == "pallas":
        overrides["fused_layer_norm"] = True
    elif args.ln:
        overrides["fused_layer_norm"] = args.ln
    model, batch = build_flagship(
        encoder_dtype="bfloat16", serving=True,
        vit_overrides=overrides or None,
    )
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    base_params, tasks, _ = model.create_tasks(
        instruction_dict={
            "language_instruction": example["task"]["language_instruction"]
        },
        initial_state=example["initial_state"],
    )
    base_params = jax.device_put(
        prepare_serving_params(model, base_params, image_size=224)
    )
    images = jax.device_put(example["observation"]["image_primary"])
    token_embedding = jax.device_put(
        example["task"]["language_instruction"]["token_embedding"]
    )
    pad_mask = jax.device_put(example["observation"]["timestep_pad_mask"])
    rng = jax.random.PRNGKey(0)

    if args.trunk_kernel:
        from hypervla_tpu.ops.serving import make_pallas_trunk_net

        serve_net, variables = make_pallas_trunk_net(model, base_params)
        base_params = jax.device_put(variables)
        net = serve_net
    else:
        base_params = {"params": base_params}
        net = model.base_net

    @jax.jit
    def step(variables, images, token_embedding, pad_mask, rng):
        return net.apply(
            variables,
            images.squeeze(1),
            token_embedding,
            pad_mask,
            rng=rng,
            rngs={"dropout": rng},
            train=False,
            method=BaseNetwork.predict_action,
        )

    action = step(base_params, images, token_embedding, pad_mask, rng)
    jax.block_until_ready(action)

    trace_dir = tempfile.mkdtemp(prefix="serve_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        action = step(base_params, images, token_embedding, pad_mask, rng)
    jax.block_until_ready(action)
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    mods = module_time_ms(pbs[-1])
    for name, (ms, count) in sorted(mods.items(), key=lambda t: -t[1][0]):
        if count:
            print(f"MODULE {name}: {ms / count:.3f} ms/call x {count}")

    per_op = summarize(pbs[-1])
    for plane, lines in per_op.items():
        for lname, ops in lines.items():
            if "XLA Ops" not in lname and "XLA TraceMe" not in lname:
                continue
            print(f"== {plane} / {lname}")
            for op, ms, cnt in ops[: args.top]:
                print(
                    f"  {ms / args.steps * 1000:9.1f} us/step "
                    f"({cnt // args.steps:4d}x) {op[:240]}"
                )
    shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
