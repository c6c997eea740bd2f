"""Optimizer construction (parity: octo/utils/train_utils.py:195-443).

LR schedules (cosine / rsqrt / constant with warmup), the four weight-decay
mask strategies, the generated-vs-shared AdamW split (different LR + WD for
hypernet output heads vs the shared/pretrained image-encoder blocks),
bfloat16 first moments, gradient accumulation, and global-norm clipping.
"""
import logging
from fnmatch import fnmatch
from typing import List

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from hypervla_tpu.typing import Params


def create_lr_schedule(name: str, **kwargs):
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(**kwargs)
    elif name == "rsqrt":
        timescale = kwargs.get("timescale", 10000)
        return optax.join_schedules(
            [
                optax.linear_schedule(
                    init_value=kwargs["init_value"],
                    end_value=kwargs["peak_value"],
                    transition_steps=kwargs["warmup_steps"],
                ),
                lambda step: kwargs["peak_value"]
                / jnp.sqrt((step + timescale) / timescale),
            ],
            [kwargs["warmup_steps"]],
        )
    elif name == "constant":
        return optax.join_schedules(
            [
                optax.linear_schedule(
                    init_value=kwargs["init_value"],
                    end_value=kwargs["peak_value"],
                    transition_steps=kwargs["warmup_steps"],
                ),
                lambda step: kwargs["peak_value"],
            ],
            [kwargs["warmup_steps"]],
        )
    raise ValueError(f"Unsupported lr schedule: {name}")


def freeze_weights(
    tx: optax.GradientTransformation,
    params_or_params_shape: Params,
    frozen_keys: List[str],
    return_partitions: bool = False,
):
    """Freezes params whose dot-joined path fnmatches any frozen_keys entry."""
    logging.info(f"Freezing parameters matching: {frozen_keys}.")
    partition_optimizers = {
        "trainable": tx,
        "frozen": optax.set_to_zero(),
    }
    param_partitions = flax.traverse_util.path_aware_map(
        lambda path, v: "frozen"
        if any(fnmatch(".".join(path), key) for key in frozen_keys)
        else "trainable",
        params_or_params_shape,
    )
    tx = optax.multi_transform(partition_optimizers, param_partitions)
    return (tx, param_partitions) if return_partitions else tx


def _wd_mask(weight_decay_strategy: str, params):
    def filter_weight_decay(path, x):
        # v2: skip norm layers in the HN (except output heads)
        path_str = jax.tree_util.keystr(path)
        if "norm" in path_str.lower() and "output_head" not in path_str:
            return False
        return True

    def weight_decay_v3(path, x):
        # WD on output heads that generate base kernels; delta-decay image
        # encoder; kernels elsewhere
        path_str = jax.tree_util.keystr(path)
        if "output_head" in path[0].key:
            return "kernel" in path[0].key
        if "image_encoder" in path_str:
            return True
        return "kernel" in path_str

    def weight_decay_v5(path, x):
        # WD only on output heads that generate base kernels + image encoder
        path_str = jax.tree_util.keystr(path)
        if "output_head" in path[0].key:
            return "kernel" in path[0].key
        return "image_encoder" in path_str

    if weight_decay_strategy == "v5":
        return jax.tree_util.tree_map_with_path(weight_decay_v5, params)
    elif weight_decay_strategy == "v3":
        return jax.tree_util.tree_map_with_path(weight_decay_v3, params)
    elif weight_decay_strategy == "v2":
        return jax.tree_util.tree_map_with_path(filter_weight_decay, params)
    # v1 default: ViT/timm/MAE style — kernels only
    return jax.tree_util.tree_map_with_path(
        lambda path, x: "kernel" in jax.tree_util.keystr(path), params
    )


def _packed_adamw(params_shape, hn_param_type, wd_mask, lr_callable,
                  base_lr_callable, weight_decay, base_weight_decay,
                  adam_kwargs):
    """AdamW over a few packed flat buffers instead of one op-chain per
    param leaf.

    Leaves are grouped by (generated|shared, weight-decayed?) — within a
    group the lr schedule and wd coefficient are uniform, so concatenating
    the raveled leaves and running elementwise AdamW on the packed vector
    is mathematically identical to the per-leaf transform (update order
    inside an elementwise op is irrelevant). This collapses ~10 XLA ops per
    leaf into ~10 per GROUP, shrinking the train step's op count; the
    optimizer state becomes {group: vector} (a different checkpoint layout
    — hence opt-in via optimizer.packed=True).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params_shape)
    kinds = jax.tree_util.tree_leaves(hn_param_type)
    decayed = jax.tree_util.tree_leaves(wd_mask)
    assert len(kinds) == len(leaves) == len(decayed)

    group_of = [
        (kind, bool(dec)) for kind, dec in zip(kinds, decayed)
    ]
    groups = sorted(set(group_of))
    members = {
        g: [i for i, gi in enumerate(group_of) if gi == g] for g in groups
    }

    def pack(tree):
        flat = jax.tree_util.tree_leaves(tree)
        return {
            str(g): jnp.concatenate(
                [jnp.ravel(flat[i]) for i in members[g]]
            )
            for g in groups
        }

    def unpack(packed):
        out = [None] * len(leaves)
        for g in groups:
            buf = packed[str(g)]
            offset = 0
            for i in members[g]:
                size = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
                out[i] = buf[offset:offset + size].reshape(leaves[i].shape)
                offset += size
        return jax.tree_util.tree_unflatten(treedef, out)

    def group_tx(g):
        kind, dec = g
        lr = base_lr_callable if kind == "shared" else lr_callable
        wd = (base_weight_decay if kind == "shared" else weight_decay) or 0.0
        return optax.adamw(
            mu_dtype=jnp.bfloat16, **adam_kwargs, learning_rate=lr,
            weight_decay=wd if dec else 0.0,
        )

    inner = {str(g): group_tx(g) for g in groups}

    def init(params):
        packed = pack(params)
        return {k: inner[k].init({k: v}) for k, v in packed.items()}

    def update(grads, state, params=None):
        packed_grads = pack(grads)
        packed_params = pack(params) if params is not None else None
        new_state, packed_updates = {}, {}
        for k in packed_grads:
            u, s = inner[k].update(
                {k: packed_grads[k]}, state[k],
                {k: packed_params[k]} if packed_params is not None else None,
            )
            packed_updates[k] = u[k]
            new_state[k] = s
        return unpack(packed_updates), new_state

    return optax.GradientTransformation(init, update)


def create_optimizer(
    params_or_params_shape: Params,
    hn_param_type,
    weight_decay_strategy: str = "v1",
    **kwargs,
):
    """Returns (tx, lr_callable, base_lr_callable, param_norm_callable).

    hn_param_type: pytree of "generated" | "shared" labels over the HN params
    (the reference hardcodes image_encoder blocks as "shared",
    scripts/train.py:287-293).
    """
    if isinstance(kwargs["learning_rate"], dict):
        lr_callable = create_lr_schedule(**kwargs["learning_rate"])
    else:
        lr_constant = kwargs["learning_rate"]
        lr_callable = lambda _: lr_constant
    kwargs.pop("learning_rate")

    if kwargs.get("base_learning_rate", None) is not None:
        if isinstance(kwargs["base_learning_rate"], dict):
            base_lr_callable = create_lr_schedule(**kwargs["base_learning_rate"])
        else:
            base_lr_constant = kwargs["base_learning_rate"]
            base_lr_callable = lambda _: base_lr_constant
        kwargs.pop("base_learning_rate", None)
    else:
        base_lr_callable = lr_callable
        kwargs.pop("base_learning_rate", None)

    wd_mask = _wd_mask(weight_decay_strategy, params_or_params_shape)

    clip_gradient = kwargs.pop("clip_gradient", None)
    frozen_keys = kwargs.pop("frozen_keys", None)
    grad_accumulation_steps = kwargs.pop("grad_accumulation_steps", 1)
    weight_decay = kwargs.pop("weight_decay", None)
    base_weight_decay = kwargs.pop("base_weight_decay", None)
    packed = kwargs.pop("packed", False)
    if packed and frozen_keys:
        raise ValueError(
            "optimizer.packed=True cannot be combined with frozen_keys: "
            "the freeze wrapper changes the leaf structure the packing "
            "spec is built from. Use per-leaf mode for frozen runs."
        )

    if packed:
        tx = _packed_adamw(
            params_or_params_shape, hn_param_type, wd_mask, lr_callable,
            base_lr_callable, weight_decay, base_weight_decay, kwargs,
        )
    elif "shared" not in jax.tree_util.tree_leaves(hn_param_type):
        tx = optax.adamw(
            mu_dtype=jnp.bfloat16,
            **kwargs,
            learning_rate=lr_callable,
            mask=wd_mask,
            weight_decay=weight_decay,
        )
    else:
        hn_wd_mask = jax.tree_util.tree_map(
            lambda x, y: x & (y == "generated"), wd_mask, hn_param_type
        )
        base_wd_mask = jax.tree_util.tree_map(
            lambda x, y: x & (y == "shared"), wd_mask, hn_param_type
        )
        partition_optimizers = {
            "generated": optax.adamw(
                mu_dtype=jnp.bfloat16,
                **kwargs,
                learning_rate=lr_callable,
                mask=hn_wd_mask,
                weight_decay=weight_decay,
            ),
            "shared": optax.adamw(
                mu_dtype=jnp.bfloat16,
                **kwargs,
                learning_rate=base_lr_callable,
                mask=base_wd_mask,
                weight_decay=base_weight_decay,
            ),
        }
        tx = optax.multi_transform(partition_optimizers, hn_param_type)

    if grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, grad_accumulation_steps)
    if clip_gradient is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_gradient), tx)

    if frozen_keys:
        tx, param_partitions = freeze_weights(
            tx, params_or_params_shape, frozen_keys, return_partitions=True
        )
        zero_frozen = lambda params: jax.tree_util.tree_map(
            lambda x, y: x if y == "trainable" else jnp.zeros(()),
            params,
            param_partitions,
        )
        param_norm_callable = lambda params: optax.global_norm(zero_frozen(params))
    else:
        param_norm_callable = optax.global_norm

    return tx, lr_callable, base_lr_callable, param_norm_callable


def hn_param_type_tree(params):
    """Labels each HN param block "shared" (image-encoder blocks) or
    "generated" (parity: scripts/train.py:287-293)."""

    def check(path, _):
        if "image_encoder" in path[0].key:
            return "shared"
        return "generated"

    return jax.tree_util.tree_map_with_path(check, params)
