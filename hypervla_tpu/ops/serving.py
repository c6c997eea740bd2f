"""Fused closed-loop serving step.

One jitted XLA program per control tick (per BASELINE.json's north star:
"action-ensemble ... handled on-device"): raw camera frame -> lanczos3
resize (+ optional sqrt(0.9) center crop) -> generated base-net forward ->
action un-normalization -> exponential action-chunk ensembling against a
rolling on-device history buffer. The host only moves one uint8 frame in and
one 7-float action out per tick.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hypervla_tpu.ops import preprocess


@jax.jit
def _cast_f32_leaves_bf16(tree):
    """One compiled program casting every fp32 leaf to bf16.

    Doing this as an eager tree_map is ~190 separate convert dispatches,
    each a tiny compile+RPC on a tunneled/shared chip — measured 30-257 s
    of episode setup under contention (round-4 cold-start diagnosis, the
    r3 driver's 311.8 s hypernet_gen_first_call_s regression). One jit is
    one dispatch."""
    return jax.tree_util.tree_map(
        lambda x: (
            x.astype(jnp.bfloat16)
            if jnp.asarray(x).dtype == jnp.float32 else x
        ),
        tree,
    )


#: canonical stacked-trunk impl names for user-facing trunk_kernel strings
#: (`True` is resolved per call site: the low-level serving step keeps the
#: Pallas kernel, InferenceWrapper/bench default to scan — no cold-start
#: program-load stall through tunneled backends, PERF.md round 5)
TRUNK_IMPL_ALIASES = {
    "pallas": "pallas_serving", "1": "pallas_serving",
    "scan": "scan_serving", "unroll": "unroll_serving",
    "pallas_serving": "pallas_serving", "scan_serving": "scan_serving",
    "unroll_serving": "unroll_serving",
}


def resolve_trunk_impl(value: str) -> str:
    """Maps a user-facing trunk_kernel string to its canonical impl name.
    Raises on anything unrecognized — a typo must error, not silently
    benchmark a different trunk engine."""
    try:
        return TRUNK_IMPL_ALIASES[value]
    except (KeyError, TypeError):
        raise ValueError(
            f"unrecognized trunk_kernel value {value!r}; expected one of "
            + ", ".join(sorted(TRUNK_IMPL_ALIASES))
        )


def prepare_serving_params(model, base_params, image_size: int = 224,
                           cast_shared_bf16: bool = True):
    """Off-step preparation of an episode's generated params for serving.

    Run once per episode after `create_tasks` (NOT in the per-tick loop):
    on a bfloat16 trunk, stores the shared image-encoder weights in bfloat16
    — every op casts them to bf16 anyway, so pre-casting is value-identical
    while halving the per-step weight streams from HBM and shrinking the
    compiled program (device step measured 0.595 -> 0.565 ms on v5e).
    fp32 configs are returned untouched (reference-parity paths unaffected).
    """
    import flax.core

    vit_kwargs = model.config["base_net_kwargs"]["vit_kwargs"]
    if vit_kwargs.get("encoder_type") != "DINOv2":
        return base_params
    if not cast_shared_bf16 or str(
        vit_kwargs.get("encoder_dtype", "float32")
    ) not in ("bfloat16", "bf16"):
        return base_params
    params = dict(flax.core.unfreeze(base_params))
    params["encoder"] = dict(params["encoder"])
    params["encoder"]["image_encoder"] = _cast_f32_leaves_bf16(
        dict(params["encoder"]["image_encoder"])
    )
    return params


def pack_generated_params(model, base_params):
    """Packs all GENERATED param leaves into ONE flat fp32 buffer.

    The serving step's per-call host cost scales with argument-leaf count
    (~296 for the flagship: ~110 tiny generated leaves + ~186 trunk leaves).
    The generated leaves total well under 1 MB, so packing them into a single
    vector and unpacking with STATIC slices inside the jit is device-free in
    practice while cutting a third of the per-call handles. (Packing the
    344 MB shared trunk the same way was measured catastrophic — XLA
    materializes every slice; see PERF.md round-1 negatives — so shared
    leaves stay as-is.)

    Returns (packed_vec, shared_leaves, unpack_fn); unpack_fn is traceable:
    unpack_fn(packed_vec, shared_leaves) -> full param tree.
    """
    import flax.core

    base_params = flax.core.unfreeze(base_params)
    flag_tree = model.hypernet.base_net_metadata["generation_flag"]
    leaves, treedef = jax.tree_util.tree_flatten(base_params)
    flags = jax.tree_util.tree_leaves(flag_tree)
    assert len(flags) == len(leaves), "generation_flag/params tree mismatch"

    specs = []  # (generated, shape, size, dtype)
    for leaf, gen in zip(leaves, flags):
        leaf = jnp.asarray(leaf)
        specs.append((bool(gen), leaf.shape, int(np.prod(leaf.shape)),
                      leaf.dtype))
    packed = jnp.concatenate([
        jnp.ravel(leaf).astype(jnp.float32)
        for leaf, gen in zip(leaves, flags) if gen
    ])
    shared = [leaf for leaf, gen in zip(leaves, flags) if not gen]

    def unpack(packed_vec, shared_leaves):
        out = []
        offset = 0
        shared_iter = iter(shared_leaves)
        for gen, shape, size, dtype in specs:
            if gen:
                out.append(
                    packed_vec[offset:offset + size].reshape(shape).astype(
                        dtype
                    )
                )
                offset += size
            else:
                out.append(next(shared_iter))
        return jax.tree_util.tree_unflatten(treedef, out)

    return packed, shared, unpack


def make_arg_packer(example_tree, keep_bytes: int = 4 * 1024 * 1024,
                    coerce: bool = False):
    """Shrinks a per-call argument tree to a handful of device handles.

    On a shared/tunneled chip the per-call host cost tracks the argument
    surface (PERF.md round-3 serving A/B: the 4-leaf Pallas trunk beats the
    ~190-leaf XLA trunk on wall clock while losing on device time). The
    Pallas-trunk serving step still passes ~80 tiny leaves (the generated
    policy net + trunk embeddings, ~1.5 MB total); this packs every leaf
    <= keep_bytes into ONE flat buffer per dtype, unpacked with STATIC
    slices inside the jit. Static slices of a few-MB buffer are bandwidth
    noise — unlike the 344 MB whole-tree packing measured catastrophic in
    round 1 (big leaves therefore pass through unchanged).

    coerce=True additionally folds bool and 32-bit integer leaves into the
    float32 buffer (bool via exact 0/1 cast, ints via bit-preserving
    bitcast) so a mixed tree of params + episode-constant inputs (pad mask,
    PRNG key data) still ships as ONE buffer per float dtype.

    Returns (pack, unpack): pack(tree) -> (packed: {dtype: vec}, big: list)
    runs once per episode; unpack(packed, big) -> tree is traceable and
    runs inside the per-tick jit.
    """
    leaves, treedef = jax.tree_util.tree_flatten(example_tree)
    specs = []
    offsets = {}
    n_big = 0
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        if leaf.size * leaf.dtype.itemsize > keep_bytes:
            specs.append(("big", n_big, None, None, None, None))
            n_big += 1
            continue
        method = "none"
        key = str(leaf.dtype)
        if coerce and leaf.dtype == jnp.bool_:
            method, key = "bool", "float32"
        elif coerce and leaf.dtype in (jnp.int32, jnp.uint32):
            method, key = "bitcast", "float32"
        off = offsets.get(key, 0)
        specs.append(
            ("packed", key, off, int(leaf.size), leaf.shape,
             (method, leaf.dtype))
        )
        offsets[key] = off + int(leaf.size)
    keys = sorted(offsets)

    def _encode(leaf, method):
        if method == "bool":
            return leaf.astype(jnp.float32)
        if method == "bitcast":
            return jax.lax.bitcast_convert_type(leaf, jnp.float32)
        return leaf

    def _decode(flat, method, dtype):
        if method == "bool":
            return flat != 0.0
        if method == "bitcast":
            return jax.lax.bitcast_convert_type(flat, dtype)
        return flat

    # jitted: packing eagerly is ~80 ravel+concat dispatches (each an RPC
    # on a tunneled chip); one jit program is one dispatch and its compile
    # is HLO-cache-persistent across processes
    @jax.jit
    def pack(tree):
        got = jax.tree_util.tree_flatten(tree)[1]
        assert got == treedef, "tree structure changed since packer creation"
        buckets = {k: [] for k in keys}
        big = []
        for leaf, spec in zip(jax.tree_util.tree_leaves(tree), specs):
            leaf = jnp.asarray(leaf)
            if spec[0] == "big":
                big.append(leaf)
            else:
                buckets[spec[1]].append(
                    jnp.ravel(_encode(leaf, spec[5][0]))
                )
        packed = {k: jnp.concatenate(buckets[k]) for k in keys}
        return packed, big

    def unpack(packed, big):
        out = []
        for spec in specs:
            if spec[0] == "big":
                out.append(big[spec[1]])
            else:
                _, key, off, size, shape, (method, dtype) = spec
                flat = packed[key][off:off + size]
                out.append(_decode(flat, method, dtype).reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack


def make_pallas_trunk_net(model, base_params, impl: str = "pallas_serving"):
    """Serving variant of the base net whose DINOv2 layers run over
    pre-stacked per-layer weights: as ONE Pallas weight-streaming kernel
    (impl="pallas_serving", ops/dino_layer.py) or as an XLA lax.scan with
    identical math (impl="scan_serving" — same 3-array dispatch surface,
    no Mosaic custom call; cold processes skip the server-side Pallas
    program-load stall measured at 583 s through the tunneled backend).

    Returns (serve_net, variables): `serve_net` is the model's BaseNetwork
    cloned with `dino_layers_impl=impl`; `variables` is the
    apply dict — {"params": <base_params with the 168 per-layer trunk
    leaves stripped>, "trunk_kernel": <3 stacked arrays>}. Run once per
    episode after `create_tasks` / `prepare_serving_params`:

        serve_net, variables = make_pallas_trunk_net(model, base_params)
        action = jax.jit(lambda v, *a: serve_net.apply(v, *a, ...))(
            variables, images, ...)
    """
    import flax.core

    from hypervla_tpu.ops.dino_layer import stack_serving_layer_params

    assert impl in ("pallas_serving", "scan_serving", "unroll_serving"), impl
    vit_kwargs = dict(model.config["base_net_kwargs"]["vit_kwargs"])
    assert vit_kwargs.get("encoder_type") == "DINOv2", (
        "the stacked trunk impls are DINOv2-only"
    )
    vit_kwargs["dino_layers_impl"] = impl
    vit_kwargs["sow_dino_attention"] = False
    serve_net = model.base_net.clone(vit_kwargs=vit_kwargs)

    params = dict(flax.core.unfreeze(base_params))
    params["encoder"] = dict(params["encoder"])
    image_encoder = dict(params["encoder"]["image_encoder"])
    encoder_inner = dict(image_encoder["encoder"])
    layer_params = encoder_inner.pop("layer")
    image_encoder["encoder"] = encoder_inner
    params["encoder"]["image_encoder"] = image_encoder

    from hypervla_tpu.models.encoders.dinov2 import dinov2_config

    cfg = dinov2_config(
        vit_kwargs.get("pretrained_encoder_name", "dinov2-base")
    )
    w, b, p = stack_serving_layer_params(
        layer_params, layerscale_value=cfg.layerscale_value
    )
    variables = {
        "params": params,
        "trunk_kernel": {
            "encoder": {"image_encoder": {"w": w, "b": b, "p": p}}
        },
    }
    return serve_net, variables


def make_serving_step(
    model,
    unnorm_stats: dict,
    normalization_type: str = "normal",
    image_size: int = 224,
    crop: bool = True,
    ensemble_temp: float = 0.0,
    ensemble: bool = True,
    trunk_kernel: bool = False,
    pack_args: bool = False,
):
    """Builds (step_fn, init_history) for fused closed-loop serving.

    step_fn(base_params, frame_u8, token_embedding, history, step_idx, rng)
        -> (action[action_dim], new_history)
    history: (pred_horizon, pred_horizon, action_dim) rolling chunk buffer.
    trunk_kernel=True runs the DINOv2 trunk as the Pallas weight-streaming
    kernel: base_params must then be the `variables` dict returned by
    make_pallas_trunk_net (params + trunk_kernel collections).
    pack_args=True shrinks the per-tick dispatch surface: call
    `step_fn.pack_params(base_params, token_embedding, rng)` once per
    episode (after create_tasks/prepare/make_pallas_trunk_net) and pass its
    result as base_params; the step is then called as
    `step_fn(packed_episode, frame, history, step_idx)` — params AND the
    episode-constant token embedding + PRNG key ride in one flat buffer
    per dtype (see make_arg_packer), so a tick dispatches ~5 handles
    instead of ~10. The rng is per-episode under pack_args (it is unused
    by the deterministic argmax decode serving runs anyway).
    """
    from hypervla_tpu.models.base_network import BaseNetwork

    horizon = model.config["base_net_kwargs"]["action_horizon"]
    action_dim = model.config["base_net_kwargs"]["action_dim"]
    serve_net = model.base_net
    if trunk_kernel:
        # trunk_kernel: True/"pallas" -> Pallas streaming kernel;
        # "scan" -> the XLA lax.scan twin over the same stacked weights;
        # "unroll" -> the statically-unrolled twin (measured -22%,
        # NEGATIVES.md). Unrecognized strings raise (resolve_trunk_impl).
        impl = (
            "pallas_serving" if trunk_kernel is True
            else resolve_trunk_impl(trunk_kernel)
        )
        vit_kwargs = dict(model.config["base_net_kwargs"]["vit_kwargs"])
        vit_kwargs["dino_layers_impl"] = impl
        vit_kwargs["sow_dino_attention"] = False
        serve_net = model.base_net.clone(vit_kwargs=vit_kwargs)

    mean = jnp.asarray(unnorm_stats.get("mean", np.zeros(action_dim)),
                       jnp.float32)
    std = jnp.asarray(unnorm_stats.get("std", np.ones(action_dim)),
                      jnp.float32)
    p01 = jnp.asarray(unnorm_stats.get("p01", -np.ones(action_dim)),
                      jnp.float32)
    p99 = jnp.asarray(unnorm_stats.get("p99", np.ones(action_dim)),
                      jnp.float32)
    mask = jnp.asarray(
        unnorm_stats.get("mask", np.ones(action_dim, bool)), bool
    )

    def init_history():
        return jnp.zeros((horizon, horizon, action_dim), jnp.float32)

    packer_cell = {}

    def _pack_params(params, token_embedding=None, rng=None):
        if token_embedding is None:
            raise TypeError(
                "pack_params now folds the episode constants: call "
                "pack_params(params, token_embedding, rng)"
            )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        episode = {
            "params": params,
            "token_embedding": jnp.asarray(token_embedding),
            "rng": jax.random.key_data(rng),
        }
        if "fns" not in packer_cell:
            packer_cell["fns"] = make_arg_packer(episode, coerce=True)
        return packer_cell["fns"][0](episode)

    def _episode_step(packed_episode, frame, history, step_idx):
        episode = packer_cell["fns"][1](*packed_episode)
        rng = jax.random.wrap_key_data(episode["rng"])
        return _single_step(
            episode["params"], frame, episode["token_embedding"], history,
            step_idx, rng,
        )

    def _single_step(base_params, frame, token_embedding, history, step_idx,
                     rng):
        # ---- preprocessing (device) ----
        img = preprocess.resize_image(frame, (image_size, image_size))
        if crop:
            scale = float(np.sqrt(0.9))
            offset = (1 - scale) / 2
            from hypervla_tpu.eval.inference import _crop_and_resize_bilinear

            img = _crop_and_resize_bilinear(
                img.astype(jnp.float32),
                (offset, offset, offset + scale, offset + scale),
                (image_size, image_size),
            )
            img = jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)
        images = img[None, None]  # (batch, window, H, W, C)

        # ---- generated base-net forward ----
        raw = serve_net.apply(
            base_params if trunk_kernel else {"params": base_params},
            images.squeeze(1),
            token_embedding,
            jnp.ones((1, 1)),
            rng=rng,
            rngs={"dropout": rng},
            train=False,
            method=BaseNetwork.predict_action,
        )[0]  # (horizon, action_dim)

        # ---- un-normalization ----
        if normalization_type == "normal":
            raw = jnp.where(mask, raw * std + mean, raw)
        else:  # bounds
            raw = jnp.where(
                mask, (raw + 1) * (p99 - p01 + 1e-8) / 2 + p01, raw
            )

        if not ensemble:
            return raw[0], history

        # ---- on-device exponential ensembling ----
        history = jnp.roll(history, 1, axis=0)
        history = history.at[0].set(raw)
        num_valid = jnp.minimum(step_idx + 1, horizon)
        # chunk predicted i steps ago contributes its i-th action
        idx = jnp.arange(horizon)
        contributions = history[idx, idx]  # (horizon, action_dim)
        valid = (idx < num_valid)[:, None]
        weights = jnp.exp(-ensemble_temp * idx)[:, None] * valid
        action = jnp.sum(weights * contributions, axis=0) / jnp.sum(
            weights, axis=0
        )
        return action, history

    step_fn = jax.jit(_episode_step if pack_args else _single_step)
    step_fn._single = _single_step  # reused by the multi-task wrapper
    step_fn.pack_params = _pack_params
    return step_fn, init_history


def make_scan_serving_step(model, unnorm_stats: dict, k: int, **kwargs):
    """K control ticks per dispatch: a `lax.scan` over the fused serving
    step, action ensembler in-graph (VERDICT r4 item 8).

    The per-tick path is dispatch-bound on a shared/tunneled chip (device
    ~0.6 ms vs wall ~1.0 ms — PERF.md device-true rate 1440-1620 actions/s
    across rounds); scanning K ticks inside one XLA program pays the
    dispatch once per K actions, so wall rate approaches the device rate.
    The host hands in K frames at once — the receding-horizon regime where
    the camera ticks slower than the control loop, or offline replay; for
    strict per-frame closed loop keep the per-tick step. Matches the
    control loop the reference pays per-tick Python for
    (/root/reference/data/simpler/evaluate.py:296-352).

    step_fn(base_params, frames_u8[K, H, W, C], token_embedding, history,
            step_idx, rng) -> (actions[K, action_dim], new_history)
    history/step_idx thread through the scan exactly as K sequential calls
    of the per-tick step would (tested bit-identical in test_serving).
    pack_args=True mirrors the per-tick packing: call
    step_fn.pack_params(params, token_embedding, rng) once per episode and
    then step_fn(packed_episode, frames, history, step_idx).
    """
    pack_args = bool(kwargs.pop("pack_args", False))
    single, init_history = make_serving_step(
        model, unnorm_stats, pack_args=False, **kwargs
    )
    tick = single._single

    def _scan(base_params, frames, token_embedding, history, step_idx, rng):
        assert frames.shape[0] == k, (
            f"scan step built for k={k}, got {frames.shape[0]} frames"
        )

        def body(carry, frame):
            hist, idx = carry
            action, hist = tick(
                base_params, frame, token_embedding, hist, idx, rng
            )
            return (hist, idx + 1), action

        (history, _), actions = jax.lax.scan(
            body, (history, step_idx), frames
        )
        return actions, history

    packer_cell = {}

    def _pack_params(params, token_embedding, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        episode = {
            "params": params,
            "token_embedding": jnp.asarray(token_embedding),
            "rng": jax.random.key_data(rng),
        }
        if "fns" not in packer_cell:
            packer_cell["fns"] = make_arg_packer(episode, coerce=True)
        return packer_cell["fns"][0](episode)

    def _episode_scan(packed_episode, frames, history, step_idx):
        episode = packer_cell["fns"][1](*packed_episode)
        rng = jax.random.wrap_key_data(episode["rng"])
        return _scan(
            episode["params"], frames, episode["token_embedding"], history,
            step_idx, rng,
        )

    step_fn = jax.jit(_episode_scan if pack_args else _scan)
    step_fn.pack_params = _pack_params
    return step_fn, init_history


def make_multitask_serving_step(model, unnorm_stats: dict, **kwargs):
    """Batched serving of N DIFFERENT tasks per tick in one XLA program.

    vmaps the fused single-task step over the task axis — but only over the
    GENERATED parameter leaves; shared blocks (the 86M-param DINOv2 trunk)
    stay unbatched and are read once per tick regardless of N. Per-task
    tiny-policy matmuls become one batched gemm: the framework's signature
    per-sample-weights pattern applied to serving.

    Returns (step_fn, init_history, stack_task_params):
      step_fn(stacked_params, frames[N,...], token_embeddings[N,...],
              histories[N,...], step_idx[N], rngs[N]) ->
              (actions[N, action_dim], new_histories)
      stack_task_params([params_task0, params_task1, ...]) stacks generated
      leaves on a new leading axis and keeps shared leaves from task 0.
    """
    assert not kwargs.get("pack_args"), (
        "pack_args packs the whole tree; the multi-task wrapper needs "
        "per-leaf vmap axes — pack is single-task only"
    )
    single, init_history = make_serving_step(model, unnorm_stats, **kwargs)
    generation_flag = model.hypernet.base_net_metadata["generation_flag"]
    params_axes = jax.tree_util.tree_map(
        lambda generated: 0 if generated else None, generation_flag
    )

    step_fn = jax.jit(
        jax.vmap(single._single, in_axes=(params_axes, 0, 0, 0, 0, 0))
    )

    def stack_task_params(per_task_params):
        import flax.core

        per_task_params = [
            flax.core.unfreeze(p) for p in per_task_params
        ]
        return jax.tree_util.tree_map(
            lambda generated, *leaves: (
                jnp.stack(leaves) if generated else leaves[0]
            ),
            generation_flag,
            *per_task_params,
        )

    return step_fn, init_history, stack_task_params
