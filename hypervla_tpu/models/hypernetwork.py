"""HyperNetwork: task -> base-network weights.

Behavioral parity with /root/reference/hypervla/components/hypernetwork.py:
T5 token embeddings (+ optional initial-image patch embeddings and goal-image
SmallStem16 tokens) are projected into a transformer "context encoder" along
with learnable layer tokens; per-param-block linear output heads turn the
layer-token embeddings into base-net weights. Zero-initialized head kernels +
the bias-init protocol guarantee the HN initially emits exactly a freshly
initialized base network.

TPU-first redesign of the fan-out: the reference applies one tiny nn.Dense per
param block (hundreds of launch-bound matmuls with output dims from 64 to
~50k). Here every generated block keeps its own (kernel, bias) parameters —
same pytree structure, same init protocol — but at apply time the kernels of
all blocks sharing a context token are CONCATENATED into a single
[context_dim, sum(block_dims)] matrix so the whole generation step is one MXU
matmul per token group (a single matmul for the flagship
`share_layer_index=True` config).
"""
import re
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.models.transformer import Transformer
from hypervla_tpu.models.vit_encoders import SmallStem16
from hypervla_tpu.models.weight_plan import InitOptions


class _HeadParams(nn.Module):
    """Parameter container for one generated block's output head.

    Mirrors nn.Dense's param layout ({kernel, bias}) without owning compute;
    the packed matmul in HyperNetwork consumes the params directly.
    """

    context_dim: int
    output_dim: int
    use_bias: bool = True
    kernel_stddev: float = 0.0  # 0 => zero init (the bias-init protocol)

    def setup(self):
        if self.kernel_stddev > 0.0:
            kernel_init = nn.initializers.truncated_normal(
                stddev=self.kernel_stddev
            )
        else:
            kernel_init = nn.initializers.zeros
        self.kernel = self.param(
            "kernel", kernel_init, (self.context_dim, self.output_dim)
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.output_dim,)
            )


def head_name_for_block(block_name: str, share_tf_output_head: bool) -> str:
    if share_tf_output_head:
        return re.sub(r"encoderblock_\d+", "encoderblock", block_name)
    return block_name


class HyperNetwork(nn.Module):
    base_net_metadata: Dict[str, Any]
    hypernet_kwargs: Dict[str, Any]

    def setup(self):
        hk = self.hypernet_kwargs
        context_dim = hk["context_embedding_dim"]

        self.token_projection = nn.Dense(context_dim, name="task_token_projection")
        if hk.get("use_initial_image", False):
            self.image_projection = nn.Dense(
                context_dim, name="initial_image_projection"
            )

        self.generation_strategy = hk.get("generation_strategy", "full")
        if self.generation_strategy == "full":
            self.layer_token_num = 1
        elif self.generation_strategy == "block":
            self.layer_token_num = self.base_net_metadata["block_num"]
        else:
            raise ValueError(
                f"unknown generation_strategy {self.generation_strategy}"
            )

        self.context_encoder = Transformer(
            embedding_dim=context_dim, **hk["context_encoder_kwargs"]
        )
        self.final_dropout = nn.Dropout(
            rate=hk.get("final_dropout_rate") or 0.0
        )

        info = self.base_net_metadata["output_head_info"]
        if self.generation_strategy == "full":
            self.output_head = nn.Dense(
                self.base_net_metadata["total_param_num"],
                use_bias=hk.get("output_head_bias", True),
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="output_head",
            )
            # shared blocks still get their own learnable params
            heads = {}
            for name, head_info in info.items():
                if not head_info["generation_flag"]:
                    heads[name] = self.param(
                        name,
                        nn.initializers.truncated_normal(stddev=0.02),
                        (head_info["output_dim"],),
                    )
            self.shared_params = heads
        else:
            heads = {}
            shared = {}
            for name, head_info in info.items():
                if head_info["generation_flag"]:
                    stddev = 0.0
                    if (
                        head_info["init_strategy"] == InitOptions.VARIANCE_INIT
                        and name.split("_")[-1] != "bias"
                    ):
                        stddev = float(head_info["init_variance"]) ** 0.5
                    heads[name] = _HeadParams(
                        context_dim=context_dim,
                        output_dim=head_info["output_dim"],
                        use_bias=hk.get("output_head_bias", True),
                        kernel_stddev=stddev,
                    )
                else:
                    shared[name] = self.param(
                        name,
                        nn.initializers.truncated_normal(stddev=0.02),
                        (head_info["output_dim"],),
                    )
            self.output_head = heads
            self.shared_params = shared

        # ---- packing layout: generated blocks grouped by context token ----
        share_tf = hk.get("share_TF_output_head", False)
        entries = []  # (flat_name, token_idx, dim, generated, head_name)

        name_table = self.base_net_metadata.get("flat_name")

        def _collect(path, token_idx):
            if name_table is not None:
                flat_name = _leaf_lookup(name_table, path)
            else:
                flat_name = "_".join(p.key for p in path)
            dim = _leaf_lookup(self.base_net_metadata["param_dim"], path)
            gen = _leaf_lookup(self.base_net_metadata["generation_flag"], path)
            entries.append(
                (
                    flat_name,
                    int(token_idx),
                    int(dim),
                    bool(gen),
                    head_name_for_block(flat_name, share_tf),
                )
            )
            return token_idx

        jax.tree_util.tree_map_with_path(
            _collect, self.base_net_metadata["token_index_dict"]
        )
        self.block_entries = tuple(entries)
        groups: Dict[int, list] = {}
        for e in entries:
            if e[3]:
                groups.setdefault(e[1], []).append(e)
        self.packed_groups = tuple(sorted(groups.items()))

    @nn.compact
    def generate_context_embedding(self, tasks, train: bool, initial_states=None):
        hk = self.hypernet_kwargs
        task_tokens = tasks["language_instruction"]["token_embedding"]
        token_mask = tasks["language_instruction"]["attention_mask"]
        batch_size, instruction_token_len = task_tokens.shape[:2]

        task_tokens = self.token_projection(task_tokens)
        task_tokens += self._positional_embedding("task", task_tokens)

        if hk.get("use_initial_image", False):
            if hk.get("image_dropout", 0.0) > 0:
                initial_image = nn.Dropout(rate=hk["image_dropout"])(
                    initial_states["patch_embeddings"], deterministic=not train
                )
            else:
                initial_image = initial_states["patch_embeddings"]
            if hk.get("use_all_image_tokens", False):
                initial_image_tokens = self.image_projection(initial_image)
            else:
                initial_image_tokens = self.image_projection(initial_image[:, :1])
            initial_image_tokens += self._positional_embedding(
                "initial_image", initial_image_tokens
            )
            task_tokens = jnp.concatenate(
                [task_tokens, initial_image_tokens], axis=1
            )

        if hk.get("include_goal_image", False):
            goal_images = tasks["image_primary"]
            goal_image_tokens = SmallStem16(learnable_norm=False)(goal_images)
            goal_image_tokens = goal_image_tokens.reshape(
                batch_size, -1, goal_image_tokens.shape[-1]
            )
            goal_image_tokens = nn.Dense(
                hk["context_embedding_dim"], name="goal_image_token_projection"
            )(goal_image_tokens)
            goal_image_tokens += self._positional_embedding(
                "goal_image", goal_image_tokens
            )
            task_tokens = jnp.concatenate([task_tokens, goal_image_tokens], axis=1)

        layer_tokens = jnp.zeros(
            (batch_size, self.layer_token_num, hk["context_embedding_dim"])
        )
        layer_tokens += self._positional_embedding("layer", layer_tokens)
        context_tokens = jnp.concatenate([task_tokens, layer_tokens], axis=1)
        ctx_len = context_tokens.shape[1]

        # attention mask rows: how each token attends to every other token
        if hk["attend_to_padding"]:
            instruction_attention_mask = jnp.ones(
                (batch_size, 1, ctx_len, instruction_token_len), dtype=bool
            )
        else:
            instruction_attention_mask = jnp.broadcast_to(
                jnp.expand_dims(token_mask, (1, 2)),
                (batch_size, 1, ctx_len, instruction_token_len),
            ).astype(bool)
        instruction_pad_mask = jnp.broadcast_to(
            tasks["pad_mask_dict"]["language_instruction"][:, None, None, None],
            (batch_size, 1, ctx_len, instruction_token_len),
        ).astype(bool)
        instruction_attention_mask &= instruction_pad_mask
        attention_mask = [instruction_attention_mask]

        if hk.get("use_initial_image", False):
            attention_mask.append(
                jnp.ones(
                    (batch_size, 1, ctx_len, initial_image_tokens.shape[-2]),
                    dtype=bool,
                )
            )
        if hk.get("include_goal_image", False):
            attention_mask.append(
                jnp.broadcast_to(
                    tasks["pad_mask_dict"]["image_primary"][:, None, None, None],
                    (batch_size, 1, ctx_len, goal_image_tokens.shape[1]),
                ).astype(bool)
            )

        layer_attention_mask = jnp.asarray(
            self.base_net_metadata["layer_token_mask"], dtype=bool
        )
        if layer_attention_mask.shape[-1] != self.layer_token_num:
            # 'full' strategy: one layer token regardless of block count
            # (the reference's per-block mask doesn't apply; attend freely)
            layer_attention_mask = jnp.ones(
                (self.layer_token_num,), dtype=bool
            )
        layer_attention_mask = jnp.broadcast_to(
            layer_attention_mask[None, None, None, :],
            (batch_size, 1, ctx_len, self.layer_token_num),
        )
        if not hk["task_attend_to_layer"]:
            layer_attention_mask = layer_attention_mask.at[
                :, :, : -self.layer_token_num, :
            ].set(False)
        attention_mask.append(layer_attention_mask)
        attention_mask = jnp.concatenate(attention_mask, axis=-1)

        output, _ = self.context_encoder(context_tokens, attention_mask, train=train)
        context_embedding = output[:, -self.layer_token_num:]

        if hk.get("scale_context_embedding", False):
            context_embedding /= jnp.sqrt(hk["context_embedding_dim"])
        context_embedding = nn.Dropout(
            rate=hk.get("embedding_dropout_rate", 0.0)
        )(context_embedding, deterministic=not train)
        return context_embedding

    def __call__(self, tasks, train: bool, initial_states=None,
                 broadcast_shared: bool = True):
        """Generates the base-net param pytree.

        broadcast_shared=False returns shared (non-generated) blocks WITHOUT
        the batch dimension — the training step vmaps only over generated
        params and closes over the shared ones, so the (potentially 100M+
        param) shared image encoder is never materialized per sample.
        """
        context_embedding = self.generate_context_embedding(
            tasks, train, initial_states
        )
        batch_size = tasks["language_instruction"]["token_embedding"].shape[0]
        flat_blocks: Dict[str, jax.Array] = {}

        if self.generation_strategy == "full":
            generated = self.output_head(context_embedding[:, 0])
            offset = 0
            for name, idx, dim, gen, _ in self.block_entries:
                if gen:
                    flat_blocks[name] = generated[:, offset:offset + dim]
                offset += dim
        else:
            dropout_rate = self.hypernet_kwargs.get("final_dropout_rate", None)
            for token_idx, entries in self.packed_groups:
                ctx = context_embedding[:, token_idx]  # [B, D]
                kernel = jnp.concatenate(
                    [self.output_head[e[4]].kernel for e in entries], axis=1
                )
                packed = ctx @ kernel
                if self.hypernet_kwargs.get("output_head_bias", True):
                    bias = jnp.concatenate(
                        [self.output_head[e[4]].bias for e in entries], axis=0
                    )
                    packed = packed + bias
                if dropout_rate is not None:
                    packed = self.final_dropout(packed, deterministic=not train)
                offset = 0
                for name, _, dim, _, _ in entries:
                    flat_blocks[name] = packed[:, offset:offset + dim]
                    offset += dim

        shared_names = set()
        for name, idx, dim, gen, _ in self.block_entries:
            if not gen:
                shared = self.shared_params[name]
                if broadcast_shared:
                    flat_blocks[name] = jnp.broadcast_to(
                        shared[None], (batch_size, dim)
                    )
                else:
                    flat_blocks[name] = shared
                    shared_names.add(name)

        name_table = self.base_net_metadata.get("flat_name")

        def _rebuild(path, shape):
            if name_table is not None:
                flat_name = _leaf_lookup(name_table, path)
            else:
                flat_name = "_".join(p.key for p in path)
            if flat_name in shared_names:
                return flat_blocks[flat_name].reshape(*tuple(shape))
            return flat_blocks[flat_name].reshape(batch_size, *tuple(shape))

        base_params = jax.tree_util.tree_map_with_path(
            _rebuild, self.base_net_metadata["param_shape"]
        )
        return base_params, context_embedding

    def _positional_embedding(self, name: str, tokens: jax.Array):
        embedding = self.param(
            f"{name}_pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, *tokens.shape[-2:]),
        )
        return jnp.broadcast_to(embedding, tokens.shape)


def _leaf_lookup(tree, path):
    node = tree
    for p in path:
        node = node[p.key]
    return node


def rebuild_shared_subtree(hypernet_params, base_net_metadata,
                           subtree=("encoder", "image_encoder")):
    """Reshapes the hypernet's flat SHARED leaves into a base-net param
    subtree without running the hypernet.

    Shared blocks (e.g. the 86M-param DINOv2 trunk under
    shared_modules=("image_encoder",)) live in the hypernet's params as
    flat vectors keyed by their flat block name; they do not depend on the
    task, so callers can rebuild them once per batch. The train step uses
    this to hoist the trunk forward out of its per-sample vmap — under
    vmap, XLA computes the closed-over trunk's weight gradients as
    per-sample multiply+reduce fusions on the VPU instead of MXU matmuls
    (~15 ms of the 163 ms bs=64 step, round-3 profile)."""
    shapes = base_net_metadata["param_shape"]
    names = base_net_metadata.get("flat_name")
    flags = base_net_metadata["generation_flag"]
    for key in subtree:
        shapes = shapes[key]
        names = names[key] if names is not None else None
        flags = flags[key]
    for gen in jax.tree_util.tree_leaves(flags):
        assert not gen, f"subtree {subtree} contains generated blocks"

    def _rebuild(path, shape):
        if names is not None:
            flat_name = _leaf_lookup(names, path)
        else:
            flat_name = "_".join(subtree) + "_" + "_".join(
                p.key for p in path
            )
        return hypernet_params[flat_name].reshape(tuple(shape))

    return jax.tree_util.tree_map_with_path(_rebuild, shapes)
