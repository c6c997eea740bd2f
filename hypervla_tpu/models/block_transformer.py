"""Group-structured transformer (parity: octo/model/components/block_transformer.py).

Token groups (prefix groups like task tokens; timestep groups like
observation/readout tokens repeated per horizon step) declare attention rules
toward each other; the BlockTransformer assembles one token sequence, builds
the rule+padding attention mask, and runs the shared Transformer stack.

TPU-native delta: the attention mask is constructed blockwise with numpy
broadcasting over group pairs (the reference fills an O(T^2) Python loop at
trace time, block_transformer.py:325-330) — same mask, O(G^2 * H^2) block
fills instead of 200k+ Python iterations.
"""
import logging
from enum import Enum
from fnmatch import fnmatch
from typing import Any, Dict, Mapping, Sequence, Tuple, Union

import einops
import flax
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.models.transformer import Transformer


class AttentionRule(Enum):
    """When a group attends to another group."""

    NEVER = "never"
    CAUSAL = "other.timestep <= self.timestep"
    CURRENT = "other.timestep == self.timestep"
    STRICT_PAST = "other.timestep < self.timestep"
    ALL = "all"  # breaks causal structure; use with care


@flax.struct.dataclass
class PrefixGroup(TokenGroup):
    """Tokens at the start of the sequence (e.g. task tokens).
    tokens: (batch, n_tokens, d); mask: (batch, n_tokens)."""

    name: str = flax.struct.field(pytree_node=False, default="")
    attention_rules: Mapping[str, AttentionRule] = flax.struct.field(
        pytree_node=False, default_factory=dict
    )

    def __post_init__(self):
        assert len(self.tokens.shape) == 3, (
            "PrefixGroup tokens must be (batch, n_tokens, d)"
        )
        assert len(self.mask.shape) == 2, (
            "PrefixGroup mask must be (batch, n_tokens)"
        )


@flax.struct.dataclass
class TimestepGroup(TokenGroup):
    """Tokens repeated per timestep (e.g. observation tokens).
    tokens: (batch, horizon, n_tokens, d); mask: (batch, horizon, n_tokens)."""

    name: str = flax.struct.field(pytree_node=False, default="")
    attention_rules: Mapping[str, AttentionRule] = flax.struct.field(
        pytree_node=False, default_factory=dict
    )

    def __post_init__(self):
        assert len(self.tokens.shape) == 4, (
            "TimestepGroup tokens must be (batch, horizon, n_tokens, d)"
        )
        assert len(self.mask.shape) == 3, (
            "TimestepGroup mask must be (batch, horizon, n_tokens)"
        )


def find_match(pattern_dict: Dict[str, Any], name: str, default: Any) -> Any:
    for pattern, value in pattern_dict.items():
        if fnmatch(name, pattern):
            return value
    return default


def _rule_allows(rule: AttentionRule, self_t: int, other_t: int) -> bool:
    if rule == AttentionRule.CAUSAL:
        return other_t <= self_t
    if rule == AttentionRule.CURRENT:
        return other_t == self_t
    if rule == AttentionRule.STRICT_PAST:
        return other_t < self_t
    if rule == AttentionRule.ALL:
        return True
    if rule == AttentionRule.NEVER:
        return False
    raise ValueError(f"Invalid attention rule: {rule}")


def split_tokens(ary: jax.Array, n_tokens_per_group: Sequence[int], axis: int):
    cumsum = np.cumsum(n_tokens_per_group)
    return jnp.split(ary, cumsum, axis=axis)


class BlockTransformer(nn.Module):
    """Runs the transformer over assembled prefix+timestep token groups."""

    transformer_kwargs: Dict
    enforce_causal: bool = True
    use_correct_attention: bool = False

    @nn.compact
    def __call__(
        self,
        prefix_groups: Sequence[PrefixGroup],
        timestep_groups: Sequence[TimestepGroup],
        train: bool,
        verbose: bool = False,
    ) -> Tuple[Sequence[PrefixGroup], Sequence[TimestepGroup]]:
        if verbose:
            self.pretty_print_attention_mask(prefix_groups, timestep_groups)

        horizon = timestep_groups[0].tokens.shape[1]
        assert all(group.tokens.shape[1] == horizon for group in timestep_groups)
        token_dim = timestep_groups[0].tokens.shape[-1]
        assert all(
            group.tokens.shape[-1] == token_dim
            for group in list(prefix_groups) + list(timestep_groups)
        )

        input_tokens = self.assemble_input_tokens(prefix_groups, timestep_groups)
        attention_mask = self.generate_attention_mask(
            prefix_groups, timestep_groups
        )
        self.sow("intermediates", "attention_mask", attention_mask)

        output, _ = Transformer(
            embedding_dim=token_dim, **self.transformer_kwargs
        )(input_tokens, attention_mask, train=train)

        return self.split_output_tokens(output, prefix_groups, timestep_groups)

    def assemble_input_tokens(self, prefix_groups, timestep_groups):
        """Concats timestep groups per step, folds horizon into the sequence,
        prepends prefix tokens."""
        if len(prefix_groups) > 0:
            all_prefix_tokens = jnp.concatenate(
                [group.tokens for group in prefix_groups], axis=1
            )
        else:
            all_prefix_tokens = jnp.zeros(
                (
                    timestep_groups[0].tokens.shape[0],
                    0,
                    timestep_groups[0].tokens.shape[-1],
                ),
                dtype=jnp.float32,
            )
        all_timestep_tokens = jnp.concatenate(
            [group.tokens for group in timestep_groups], axis=2
        )
        all_timestep_tokens = einops.rearrange(
            all_timestep_tokens,
            "batch horizon n_tokens d -> batch (horizon n_tokens) d",
        )
        return jnp.concatenate([all_prefix_tokens, all_timestep_tokens], axis=1)

    def split_output_tokens(self, output_tokens, prefix_groups, timestep_groups):
        horizon = timestep_groups[0].tokens.shape[1]
        tokens_per_prefix_group = [g.tokens.shape[1] for g in prefix_groups]
        n_prefix_tokens = sum(tokens_per_prefix_group)

        prefix_embeddings, timestep_embeddings = jnp.split(
            output_tokens, [n_prefix_tokens], axis=1
        )
        if len(prefix_groups) > 0:
            prefix_splits = split_tokens(
                prefix_embeddings, tokens_per_prefix_group, axis=1
            )
            all_prefix_outputs = [
                group.replace(tokens=embeddings)
                for group, embeddings in zip(prefix_groups, prefix_splits)
            ]
        else:
            all_prefix_outputs = []

        timestep_embeddings = einops.rearrange(
            timestep_embeddings,
            "batch (horizon n_tokens) d -> batch horizon n_tokens d",
            horizon=horizon,
        )
        tokens_per_timestep_group = [g.tokens.shape[2] for g in timestep_groups]
        timestep_splits = split_tokens(
            timestep_embeddings, tokens_per_timestep_group, axis=2
        )
        all_timestep_outputs = [
            group.replace(tokens=embeddings)
            for group, embeddings in zip(timestep_groups, timestep_splits)
        ]
        return all_prefix_outputs, all_timestep_outputs

    def generate_attention_mask(self, prefix_groups, timestep_groups):
        """Rule mask (blockwise) AND padding mask; shape
        (batch, 1, total_tokens, total_tokens)."""
        if self.enforce_causal:
            self.verify_causality(prefix_groups, timestep_groups)

        horizon = timestep_groups[0].tokens.shape[1]
        tokens_per_prefix = [g.tokens.shape[1] for g in prefix_groups]
        tokens_per_ts = [g.tokens.shape[2] for g in timestep_groups]

        # flat list of (group, timestep, n_tokens) segments in sequence order
        segments = [(g, -1, n) for g, n in zip(prefix_groups, tokens_per_prefix)]
        for t in range(horizon):
            segments.extend(
                (g, t, n) for g, n in zip(timestep_groups, tokens_per_ts)
            )

        total_tokens = sum(n for _, _, n in segments)
        rule_mask = np.zeros((total_tokens, total_tokens), dtype=bool)
        offsets = np.concatenate(
            [[0], np.cumsum([n for _, _, n in segments])]
        )
        for i, (gi, ti, ni) in enumerate(segments):
            for j, (gj, tj, nj) in enumerate(segments):
                rule = find_match(
                    gi.attention_rules, gj.name, AttentionRule.NEVER
                )
                if _rule_allows(rule, ti, tj):
                    rule_mask[
                        offsets[i]:offsets[i] + ni, offsets[j]:offsets[j] + nj
                    ] = True

        pad_attention_mask = self.generate_pad_attention_mask(
            prefix_groups, timestep_groups
        )
        return jnp.logical_and(jnp.asarray(rule_mask), pad_attention_mask)

    def generate_pad_attention_mask(self, prefix_groups, timestep_groups):
        batch_size, horizon = timestep_groups[0].tokens.shape[:2]
        if len(prefix_groups) > 0:
            prefix_pad_mask = jnp.concatenate(
                [group.mask for group in prefix_groups], axis=1
            )
        else:
            prefix_pad_mask = jnp.zeros((batch_size, 0), dtype=jnp.bool_)
        timestep_pad_mask = jnp.concatenate(
            [group.mask for group in timestep_groups], axis=2
        )
        timestep_pad_mask = einops.rearrange(
            timestep_pad_mask, "batch horizon n_tokens -> batch (horizon n_tokens)"
        )
        pad_mask = jnp.concatenate([prefix_pad_mask, timestep_pad_mask], axis=1)
        return jnp.broadcast_to(
            pad_mask[:, None, None, :],
            (batch_size, 1, pad_mask.shape[1], pad_mask.shape[1]),
        )

    def verify_causality(self, prefix_groups, timestep_groups):
        """No token may attend to a future timestep."""
        for prefix_group in prefix_groups:
            for ts_group in timestep_groups:
                assert (
                    prefix_group.attention_rules.get(
                        ts_group.name, AttentionRule.NEVER
                    )
                    == AttentionRule.NEVER
                ), (
                    f"Causality broken! Prefix group {prefix_group.name} "
                    f"attends to timestep group {ts_group.name}"
                )
        for group in list(prefix_groups) + list(timestep_groups):
            for other_group in list(prefix_groups) + list(timestep_groups):
                rule = find_match(
                    group.attention_rules, other_group.name, AttentionRule.NEVER
                )
                assert rule != AttentionRule.ALL, (
                    "Causality broken! AttentionRule.ALL attends to future "
                    "timesteps too."
                )

    def pretty_print_attention_mask(self, prefix_groups, timestep_groups):
        for group in prefix_groups:
            logging.warning(
                "PrefixGroup(name=%s, shape=%s, attends_to=%s)",
                group.name, group.tokens.shape, dict(group.attention_rules),
            )
        for group in timestep_groups:
            logging.warning(
                "TimestepGroup(name=%s, shape=%s, attends_to=%s)",
                group.name, group.tokens.shape, dict(group.attention_rules),
            )
