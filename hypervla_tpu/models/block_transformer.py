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


_RULE_PREDICATES = {
    AttentionRule.CAUSAL: lambda self_t, other_t: other_t <= self_t,
    AttentionRule.CURRENT: lambda self_t, other_t: other_t == self_t,
    AttentionRule.STRICT_PAST: lambda self_t, other_t: other_t < self_t,
    AttentionRule.ALL: lambda self_t, other_t: True,
    AttentionRule.NEVER: lambda self_t, other_t: False,
}


def _rule_allows(rule: AttentionRule, self_t: int, other_t: int) -> bool:
    try:
        return _RULE_PREDICATES[rule](self_t, other_t)
    except KeyError:
        raise ValueError(f"Invalid attention rule: {rule}") from None


def _unstack_groups(array: jax.Array, widths: Sequence[int], axis: int):
    """Splits a concatenated group axis back into per-group arrays."""
    return jnp.split(array, np.cumsum(widths), axis=axis)


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
        batch, _, _, width = timestep_groups[0].tokens.shape
        prefix = (
            jnp.concatenate([g.tokens for g in prefix_groups], axis=1)
            if prefix_groups
            else jnp.zeros((batch, 0, width), dtype=jnp.float32)
        )
        per_step = jnp.concatenate(
            [g.tokens for g in timestep_groups], axis=2
        )
        folded = per_step.reshape(batch, -1, width)
        return jnp.concatenate([prefix, folded], axis=1)

    def split_output_tokens(self, output_tokens, prefix_groups,
                            timestep_groups):
        """Inverse of assemble_input_tokens: routes transformer outputs back
        into per-group containers."""
        horizon = timestep_groups[0].tokens.shape[1]
        prefix_widths = [g.tokens.shape[1] for g in prefix_groups]

        head, tail = jnp.split(
            output_tokens, [sum(prefix_widths)], axis=1
        )
        prefix_out = [
            g.replace(tokens=part)
            for g, part in zip(
                prefix_groups, _unstack_groups(head, prefix_widths, axis=1)
            )
        ] if prefix_groups else []

        unfolded = tail.reshape(
            tail.shape[0], horizon, -1, tail.shape[-1]
        )
        ts_widths = [g.tokens.shape[2] for g in timestep_groups]
        timestep_out = [
            g.replace(tokens=part)
            for g, part in zip(
                timestep_groups, _unstack_groups(unfolded, ts_widths, axis=2)
            )
        ]
        return prefix_out, timestep_out

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
        """Key-side padding: a (batch, 1, L, L) mask that zeroes columns of
        padded tokens (rows are left to the rule mask)."""
        batch_size = timestep_groups[0].tokens.shape[0]
        parts = []
        if prefix_groups:
            parts.append(
                jnp.concatenate([g.mask for g in prefix_groups], axis=1)
            )
        parts.append(
            jnp.concatenate(
                [g.mask for g in timestep_groups], axis=2
            ).reshape(batch_size, -1)
        )
        key_valid = jnp.concatenate(parts, axis=1)
        length = key_valid.shape[1]
        return jnp.broadcast_to(
            key_valid[:, None, None, :], (batch_size, 1, length, length)
        )

    def verify_causality(self, prefix_groups, timestep_groups):
        """No token may attend to a future timestep: prefixes must never
        read timestep tokens, and ALL (which ignores time) is forbidden."""
        everyone = list(prefix_groups) + list(timestep_groups)
        violations = [
            (p.name, t.name)
            for p in prefix_groups
            for t in timestep_groups
            if p.attention_rules.get(t.name, AttentionRule.NEVER)
            != AttentionRule.NEVER
        ]
        assert not violations, (
            f"Causality broken! Prefix groups attend to timestep groups: "
            f"{violations}"
        )
        for group in everyone:
            for other in everyone:
                rule = find_match(
                    group.attention_rules, other.name, AttentionRule.NEVER
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
