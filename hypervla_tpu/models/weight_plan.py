"""WeightPlan: the base-net metadata machinery.

This is a first-class re-design of the reference's `HyperVLA.init_base_net`
(/root/reference/hypervla/model.py:370-515) — the protocol that makes the
whole system work:

  1. initialize the base network normally to discover its param pytree;
  2. assign every param block a context-token index (which hypernet output
     token generates it), build the layer-token attention mask;
  3. classify each block as HN-generated vs shared-across-tasks
     (`shared_modules` substring filter);
  4. derive per-block output-head info: output dim, init strategy
     (BIAS_INIT default; VARIANCE_INIT with fan-in variance for kernels), and
     the init variance;
  5. (DINOv2/CLIP) overwrite the shared image-encoder blocks with pretrained
     weights.

The derived plan additionally precomputes the *packing layout* used by the
TPU hypernetwork: generated blocks grouped by token index, concatenated into
one fused matmul per group (see models/hypernetwork.py).
"""
import logging
from enum import IntEnum
from typing import Any, Dict, Tuple

import jax
import numpy as np

from hypervla_tpu.models.base_network import BaseNetwork


class InitOptions(IntEnum):
    BIAS_INIT = 0
    VARIANCE_INIT = 1


class Shape:
    """A hashable, ==-comparable shape leaf.

    The WeightPlan metadata rides on nn.Module dataclasses as a static field,
    so jit cache keys compare it with == and hash it — numpy arrays would
    raise, and raw tuples would be flattened by tree_map. This class is an
    unregistered pytree LEAF that behaves like a shape tuple.
    """

    __slots__ = ("dims",)

    def __init__(self, dims):
        self.dims = tuple(int(d) for d in dims)

    def __iter__(self):
        return iter(self.dims)

    def __getitem__(self, i):
        return self.dims[i]

    def __len__(self):
        return len(self.dims)

    def __eq__(self, other):
        return isinstance(other, Shape) and self.dims == other.dims

    def __hash__(self):
        return hash(self.dims)

    def __repr__(self):
        return f"Shape{self.dims}"


def flatten_info_dict(d, parent_key="", sep="_"):
    """Flattens nested dicts, stopping at dicts that hold 'output_dim'."""
    items = []
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict) and "output_dim" not in v.keys():
            items.extend(flatten_info_dict(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def init_base_net(
    config: Dict[str, Any], example_batch, rng, verbose: bool = False
) -> Tuple[BaseNetwork, Any, np.ndarray, Dict[str, Any]]:
    """Build the base network, initialize it, and derive the WeightPlan.

    Returns (base_net, init_base_params, flat_init_base_params, metadata).
    """
    base_net = BaseNetwork(**config["base_net_kwargs"], octo_kwargs=config["model"])
    vit_kwargs = config["base_net_kwargs"]["vit_kwargs"]
    encoder_type = vit_kwargs["encoder_type"]

    rng, dropout_rng = jax.random.split(rng)
    rngs = {"params": rng, "dropout": dropout_rng}
    if encoder_type == "EfficientNet":
        dropout_rng, drop_connect_rng = jax.random.split(dropout_rng)
        rngs = {"params": rng, "dropout": dropout_rng,
                "drop_connect": drop_connect_rng}
    elif vit_kwargs.get("image_embedding_noise", 0.0) > 0.0:
        dropout_rng, embedding_noise_rng = jax.random.split(dropout_rng)
        rngs = {"params": rng, "dropout": dropout_rng,
                "embedding_noise": embedding_noise_rng}

    # jit the init: op-by-op dispatch is prohibitively slow on remote TPUs
    init_base_params = jax.jit(base_net.init)(rngs, example_batch)["params"]
    # values STAY on device: the WeightPlan below is derived from shapes
    # alone, and the init values are only ever assigned back into hypernet
    # params (the bias-init seeding) — downloading the full tree here costs
    # 35-80 s through a remote-chip tunnel for data that round-trips. The
    # flat vector is built by one fused device program for the same reason.
    import jax.numpy as jnp

    flat_init_base_params = jax.jit(
        lambda t: jnp.concatenate(
            [jnp.ravel(l) for l in jax.tree_util.tree_leaves(t)]
        )
    )(init_base_params)

    base_param_shapes = jax.tree_util.tree_map(
        lambda x: Shape(x.shape), init_base_params
    )
    base_param_dim = jax.tree_util.tree_map(
        lambda s: int(np.prod(s.dims)) if len(s) else 1, base_param_shapes
    )

    hk = config["hypernet_kwargs"]
    shared_modules = tuple(hk.get("shared_modules", tuple()))

    # ------- context-token index per block + layer-token attention mask -------
    index = 0
    token_index_dict = jax.tree_util.tree_map(lambda _: 0, base_param_shapes)
    layer_token_mask = []

    def _assign(subtree, idx):
        return jax.tree_util.tree_map(lambda _: idx, subtree)

    if hk.get("share_layer_index", False):
        layer_token_mask = [True]
        index = 1
    else:
        enc_shapes = base_param_shapes["encoder"]
        if encoder_type == "SmallStem":
            for module in enc_shapes["SmallStem_0"]:
                token_index_dict["encoder"]["SmallStem_0"][module] = _assign(
                    enc_shapes["SmallStem_0"][module], index
                )
                index += 1
                layer_token_mask.append("SmallStem_0" not in shared_modules)
        elif encoder_type == "EfficientNet":
            assert "EfficientNet" in shared_modules, (
                "Only shared EfficientNet is supported"
            )
            token_index_dict["encoder"]["EfficientNet_0"] = _assign(
                enc_shapes["EfficientNet_0"], index
            )
            index += 1
            layer_token_mask.append(False)
        elif encoder_type in ("DINOv2", "CLIP"):
            assert "image_encoder" in shared_modules, (
                "Pretrained image encoders must be shared"
            )
            token_index_dict["encoder"]["image_encoder"] = _assign(
                enc_shapes["image_encoder"], index
            )
            index += 1
            layer_token_mask.append(False)
        for module in enc_shapes["Transformer_0"]:
            token_index_dict["encoder"]["Transformer_0"][module] = _assign(
                enc_shapes["Transformer_0"][module], index
            )
            index += 1
            layer_token_mask.append(True)
        for module in enc_shapes:
            if module in ("SmallStem_0", "Transformer_0", "EfficientNet_0",
                          "image_encoder"):
                continue
            token_index_dict["encoder"][module] = _assign(
                enc_shapes[module], index
            )
            index += 1
            layer_token_mask.append(True)
        token_index_dict["action_head"] = _assign(
            base_param_shapes["action_head"], index
        )
        index += 1
        layer_token_mask.append(True)

    # ------------------- generated vs shared classification -------------------
    def _generated(path, value):
        path_keys = [p.key for p in path]
        for module in shared_modules:
            for path_key in path_keys:
                if module in path_key:
                    return False
        return True

    if hk.get("share_all_params", False):
        generation_flag = jax.tree_util.tree_map(lambda _: False, base_param_shapes)
    else:
        generation_flag = jax.tree_util.tree_map_with_path(
            _generated, base_param_shapes
        )

    # -------------------------- pretrained weights ---------------------------
    if encoder_type == "DINOv2":
        from hypervla_tpu.models.encoders.pretrained import load_dinov2_weights

        load_dinov2_weights(
            init_base_params, vit_kwargs.get("pretrained_encoder_name",
                                             "dinov2-base")
        )
    elif encoder_type == "CLIP":
        from hypervla_tpu.models.encoders.pretrained import load_clip_weights

        load_clip_weights(init_base_params)

    # Canonical flat name per block — the single source for how hypernet
    # param leaves are named (output heads, shared params, optimizer labels).
    flat_name = jax.tree_util.tree_map_with_path(
        lambda path, _: "_".join(p.key for p in path), base_param_shapes
    )

    metadata = {
        "token_index_dict": token_index_dict,
        "block_num": index,
        "param_shape": base_param_shapes,
        "total_param_num": int(flat_init_base_params.shape[0]),
        "param_dim": base_param_dim,
        "generation_flag": generation_flag,
        # tuple (not ndarray): metadata must stay hashable/==-comparable
        "layer_token_mask": tuple(bool(x) for x in layer_token_mask),
        "flat_name": flat_name,
        # where the shared pretrained image-encoder subtree sits in the
        # base-net param tree (None when there is no pretrained encoder);
        # consumers (delta-decay) walk this instead of constructing names
        "pretrained_block_path": (
            ("encoder", "image_encoder")
            if encoder_type in ("DINOv2", "CLIP")
            else None
        ),
    }

    # ----------------------------- output heads ------------------------------
    def _head_info(path, base_shape, base_dim, generated):
        info = {"output_dim": base_dim, "generation_flag": generated}
        path_string = ".".join([p.key for p in path])
        init_strategy = InitOptions(hk.get("init_strategy", InitOptions.BIAS_INIT))
        if (
            "encoder_norm" in path_string
            or "LayerNorm" in path_string
            or "GroupNorm" in path_string
            or not generated
        ):
            init_strategy = InitOptions.BIAS_INIT
        info["init_strategy"] = int(init_strategy)
        if init_strategy == InitOptions.VARIANCE_INIT and path[-1].key != "bias":
            if path[-1].key == "pos_embedding":
                variance = 0.02**2
            elif path[-2].key == "out":
                variance = 1.0 / (base_shape[0] * base_shape[1])
            else:
                variance = 1.0 / base_shape[0]
            if not hk.get("scale_context_embedding", False):
                variance = variance / hk["context_embedding_dim"]
        else:
            variance = 0.0
        info["init_variance"] = float(variance)
        return info

    output_head_info = jax.tree_util.tree_map_with_path(
        _head_info, base_param_shapes, base_param_dim, generation_flag
    )
    if hk.get("share_TF_output_head", False):
        tf_info = output_head_info["encoder"]["Transformer_0"]
        tf_info["encoderblock"] = tf_info.pop("encoderblock_0")
        for layer in range(1, vit_kwargs["num_layers"]):
            del tf_info[f"encoderblock_{layer}"]
    metadata["output_head_info"] = flatten_info_dict(output_head_info)

    if verbose:
        pretty_print_plan(generation_flag, token_index_dict)

    return base_net, init_base_params, flat_init_base_params, metadata


def pretty_print_plan(generation_flag, token_index_dict):
    def print_node(gen, tok, depth):
        prefix = "-" * depth * 2
        for key in gen:
            if isinstance(gen[key], dict):
                logging.info(f"{prefix}{key}")
                print_node(gen[key], tok[key], depth + 1)
            else:
                logging.info(
                    f"{prefix}{key}: HN generated: {gen[key]}, "
                    f"context token index: {tok[key]}"
                )

    print_node(generation_flag, token_index_dict, 0)
