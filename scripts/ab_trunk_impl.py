"""Interleaved wall A/B: Pallas streaming trunk vs its XLA lax.scan twin.

Both variants consume the SAME stacked (w, b, p) trunk arrays and the same
packed episode buffers (4 handles/tick); the only difference is the layer
engine — one Mosaic custom call vs a scanned XLA layer body. Alternating
windows put both variants in the same contention regime (the PERF.md
serving-A/B methodology).

Context: the Pallas program's first execution costs ~583 s through the
tunneled backend when the server-side program cache is cold (round-5
diagnosis — the r3/r4 bench-budget blowouts); the scan twin loads like any
XLA program. This A/B decides whether its steady state gives anything up.

Usage: python -m scripts.ab_trunk_impl [--windows 8] [--iters 200]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(1, REPO)

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=8,
                    help="windows PER VARIANT (alternating)")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--impls", type=str,
                    default="pallas_serving,scan_serving",
                    help="comma-separated trunk impls to interleave "
                    "(pallas_serving, scan_serving, unroll_serving)")
    args = ap.parse_args()

    from hypervla_tpu.flagship import build_flagship
    from hypervla_tpu.models.base_network import BaseNetwork
    from hypervla_tpu.ops.serving import (
        make_arg_packer,
        make_pallas_trunk_net,
        prepare_serving_params,
    )
    from hypervla_tpu.utils.jax_utils import initialize_compilation_cache

    initialize_compilation_cache()
    model, batch = build_flagship(encoder_dtype="bfloat16", serving=True)
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    base_params, _, _ = model.create_tasks(
        instruction_dict={
            "language_instruction": example["task"]["language_instruction"]
        },
        initial_state=example["initial_state"],
    )
    base_params = prepare_serving_params(model, base_params, image_size=224)

    images = jax.device_put(example["observation"]["image_primary"])
    token_embedding = jax.device_put(
        example["task"]["language_instruction"]["token_embedding"]
    )
    pad_mask = jax.device_put(
        example["observation"]["timestep_pad_mask"]
    )
    rng = jax.random.PRNGKey(0)

    steps = {}
    for impl in args.impls.split(","):
        serve_net, variables = make_pallas_trunk_net(
            model, base_params, impl=impl
        )
        episode = {
            "vars": variables,
            "tok": token_embedding,
            "mask": pad_mask,
            "rng": jax.random.key_data(rng),
        }
        pack, unpack = make_arg_packer(episode, coerce=True)
        packed, big = pack(episode)
        packed = jax.device_put(packed)
        big = jax.device_put(big)
        jax.block_until_ready(packed)

        def kernel_step(packed, big, images, *, _net=serve_net,
                        _unpack=unpack):
            ep = _unpack(packed, big)
            key = jax.random.wrap_key_data(ep["rng"])
            return _net.apply(
                ep["vars"], images.squeeze(1), ep["tok"], ep["mask"],
                rng=key, rngs={"dropout": key}, train=False,
                method=BaseNetwork.predict_action,
            )

        fn = jax.jit(kernel_step)
        t0 = time.perf_counter()
        a = fn(packed, big, images)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(a)
        first_fetch_s = time.perf_counter() - t0
        print(f"{impl}: compile {compile_s:.2f}s, first fetch "
              f"{first_fetch_s:.2f}s", flush=True)
        for _ in range(3):
            np.asarray(fn(packed, big, images))  # burn-in
        steps[impl] = (fn, packed, big)

    windows = {k: [] for k in steps}
    for w in range(args.windows):
        for impl, (fn, packed, big) in steps.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                a = fn(packed, big, images)
            np.asarray(a)
            windows[impl].append(
                (time.perf_counter() - t0) / args.iters * 1e3
            )
        time.sleep(0.3)

    for impl, ws in windows.items():
        ws = np.array(ws)
        print(
            f"{impl}: p50 {np.percentile(ws, 50):.3f} ms, "
            f"p90 {np.percentile(ws, 90):.3f} ms, best {ws.min():.3f} ms "
            f"({[round(x, 3) for x in ws.tolist()]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
