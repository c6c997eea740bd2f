"""Interleaved wall A/B: serving dispatch surface — 83 leaves vs packed.

The Pallas-trunk serving step still passes ~80 tiny param leaves per tick
(generated policy net + trunk embeddings). make_arg_packer folds them into
one flat buffer per dtype (~5 handles total). On a shared tunneled chip the
per-call host cost tracks the argument surface (PERF.md round-3 serving
section), so this measures the two variants in ALTERNATING windows within
the same contention regime — the methodology every serving A/B in PERF.md
uses.

Usage: python -m scripts.ab_pack_args [--windows 8] [--iters 200]
"""
import argparse
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=8,
                    help="windows PER VARIANT (alternating)")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--xla-trunk", action="store_true",
                    help="A/B over the XLA trunk instead of the Pallas one")
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
    if args.xla_trunk:
        serve_net, variables = model.base_net, {"params": base_params}
    else:
        serve_net, variables = make_pallas_trunk_net(model, base_params)
    variables = jax.device_put(variables)

    images = jax.device_put(example["observation"]["image_primary"])
    token_embedding = jax.device_put(
        example["task"]["language_instruction"]["token_embedding"]
    )
    pad_mask = jax.device_put(example["observation"]["timestep_pad_mask"])
    rng = jax.random.PRNGKey(0)

    def apply_net(v, images, token_embedding, pad_mask, rng):
        return serve_net.apply(
            v, images.squeeze(1), token_embedding, pad_mask, rng=rng,
            rngs={"dropout": rng}, train=False,
            method=BaseNetwork.predict_action,
        )

    plain_step = jax.jit(apply_net)

    pack, unpack = make_arg_packer(variables)
    packed, big = pack(variables)
    packed = jax.device_put(packed)
    big = jax.device_put(big)

    @jax.jit
    def packed_step(packed, big, images, token_embedding, pad_mask, rng):
        return apply_net(unpack(packed, big), images, token_embedding,
                         pad_mask, rng)

    # packed_all: the episode constants (token embedding, pad mask, rng)
    # ride in the flat buffers too — a tick dispatches packed{f32,bf16} +
    # big trunk stack + image only
    episode = {
        "vars": variables,
        "tok": token_embedding,
        "mask": pad_mask,
        "rng": jax.random.key_data(rng),
    }
    pack_all, unpack_all = make_arg_packer(episode, coerce=True)
    packed_a, big_a = pack_all(episode)
    packed_a = jax.device_put(packed_a)
    big_a = jax.device_put(big_a)

    @jax.jit
    def packed_all_step(packed, big, images):
        ep = unpack_all(packed, big)
        return apply_net(ep["vars"], images, ep["tok"], ep["mask"],
                         jax.random.wrap_key_data(ep["rng"]))

    n_plain = len(jax.tree_util.tree_leaves(variables)) + 3
    n_packed = len(jax.tree_util.tree_leaves((packed, big))) + 3
    n_all = len(jax.tree_util.tree_leaves((packed_a, big_a)))
    print(f"per-tick dispatch surface (+image): plain={n_plain + 1}, "
          f"packed={n_packed + 1}, packed_all={n_all + 1} leaves")

    a = plain_step(variables, images, token_embedding, pad_mask, rng)
    b = packed_step(packed, big, images, token_embedding, pad_mask, rng)
    c = packed_all_step(packed_a, big_a, images)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=0, atol=2e-6
    )
    print("parity OK")

    variants = {
        "plain": lambda: plain_step(variables, images, token_embedding,
                                    pad_mask, rng),
        "packed": lambda: packed_step(packed, big, images, token_embedding,
                                      pad_mask, rng),
        "packed_all": lambda: packed_all_step(packed_a, big_a, images),
    }
    windows = {k: [] for k in variants}
    for w in range(args.windows):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            np.asarray(out)  # fetch: forces the in-order stream
            dt = (time.perf_counter() - t0) / args.iters
            windows[name].append(dt)
            print(f"window {w} {name}: {1e3 * dt:.3f} ms/step")
            time.sleep(1.0)

    for name, ws in windows.items():
        ms = 1e3 * np.asarray(ws)
        print(
            f"{name}: p50 {np.percentile(ms, 50):.3f} ms  "
            f"p90 {np.percentile(ms, 90):.3f} ms  best {ms.min():.3f} ms  "
            f"({1000.0 / np.percentile(ms, 50):.0f} actions/s p50)"
        )


if __name__ == "__main__":
    main()
