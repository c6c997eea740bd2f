"""Octo transformer used as a (generated) base network.

Capability parity with hypervla/components/base_octo.py — the Octo
architecture with the hypervla deltas: the language prefix is fed as
precomputed (frozen) T5 token embeddings rather than tokenized in-model,
and `use_pretrained_image_tokenizer` lets precomputed patch tokens replace
the conv image tokenizer. The blockwise-causal sequence is
[task tokens, obs t=0 + readout t=0, obs t=1 + readout t=1, ...].

Structure: every token source funnels through one `_embed_group` step
(project to the model width, add the group's positional embedding, combine
pad masks), and the group lists are assembled declaratively before a single
BlockTransformer call.
"""
import logging
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.models.block_transformer import (
    AttentionRule,
    BlockTransformer,
    PrefixGroup,
    TimestepGroup,
)
from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.typing import Data
from hypervla_tpu.utils.spec import ModuleSpec

# what each group kind is allowed to attend to
_RULES_TASK = {"task_*": AttentionRule.CAUSAL}
_RULES_OBS = {"task_*": AttentionRule.CAUSAL, "obs_*": AttentionRule.CAUSAL}


def _readout_rules(group_name):
    return {**_RULES_OBS, group_name: AttentionRule.CAUSAL}


class OctoTransformer(nn.Module):
    observation_tokenizers: Dict[str, nn.Module]
    readouts: Dict[str, int]
    transformer_kwargs: Dict
    token_embedding_size: int
    max_horizon: int
    repeat_task_tokens: bool
    use_correct_attention: bool = False
    use_pretrained_image_tokenizer: bool = False

    def _pos_embedding(self, name: str, tokens: jax.Array):
        """Learned positional embedding per group; timestep groups embed
        max_horizon steps and truncate to the batch's horizon."""
        is_timestep = tokens.ndim == 4
        if not is_timestep and tokens.ndim != 3:
            raise ValueError(f"Invalid tokens shape: {tokens.shape}")
        shape = (
            (1, self.max_horizon, *tokens.shape[-2:]) if is_timestep
            else (1, *tokens.shape[-2:])
        )
        pos = self.param(
            f"{name}_pos_embedding", nn.initializers.normal(stddev=0.02),
            shape,
        )
        if is_timestep:
            pos = pos[:, : tokens.shape[1]]
        return jnp.broadcast_to(pos, tokens.shape)

    def _embed_group(self, group_name, raw_tokens, stop_gradient=False):
        """Project raw tokens to the model width + add the group's
        positional embedding."""
        if stop_gradient:
            raw_tokens = jax.lax.stop_gradient(raw_tokens)
        tokens = nn.Dense(
            self.token_embedding_size, name=f"{group_name}_projection"
        )(raw_tokens)
        return tokens + self._pos_embedding(group_name, tokens)

    def _language_prefix(self, tasks) -> PrefixGroup:
        tokens = self._embed_group(
            "task_language",
            tasks["language_instruction"]["token_embedding"],
            stop_gradient=True,
        )
        mask = jnp.broadcast_to(
            tasks["pad_mask_dict"]["language_instruction"][:, None],
            tokens.shape[:-1],
        )
        return PrefixGroup(
            tokens=tokens, mask=mask, name="task_language",
            attention_rules=_RULES_TASK,
        )

    def _observation_groups(self, observations, tasks, timestep_pad_mask,
                            train):
        """One TimestepGroup per image stream: either precomputed patch
        tokens (frozen) or each configured conv tokenizer."""
        groups = []

        def add(group_name, tokens, token_mask):
            groups.append(TimestepGroup(
                tokens=tokens,
                mask=jnp.logical_and(timestep_pad_mask[:, :, None],
                                     token_mask),
                name=group_name,
                attention_rules=_RULES_OBS,
            ))

        if self.use_pretrained_image_tokenizer:
            patches = observations["image_patches"]
            add(
                "obs_primary",
                self._embed_group("obs_primary", patches["token"],
                                  stop_gradient=True),
                jax.lax.stop_gradient(patches["mask"]),
            )
            return groups

        for name, tokenizer in self.observation_tokenizers.items():
            group_name = f"obs_{name}"
            out = tokenizer(observations, tasks, train=train)
            if out is None:
                logging.warning(
                    f"Skipping observation tokenizer: {group_name}"
                )
                continue
            add(group_name, self._embed_group(group_name, out.tokens),
                out.mask)
        return groups

    def _readout_group(self, readout_name, batch_size, horizon):
        """Readout slots are pure positional embeddings (zero content)."""
        group_name = f"readout_{readout_name}"
        width = self.readouts[readout_name]
        zeros = jnp.zeros(
            (batch_size, horizon, width, self.token_embedding_size)
        )
        return TimestepGroup(
            tokens=zeros + self._pos_embedding(group_name, zeros),
            mask=jnp.ones((batch_size, horizon, width), dtype=bool),
            name=group_name,
            attention_rules=_readout_rules(group_name),
        )

    @nn.compact
    def __call__(
        self,
        observations: Data,
        tasks: Data,
        timestep_pad_mask: jax.Array,
        readouts: Optional[Sequence[str]] = None,
        train: bool = False,
        verbose: bool = False,
    ) -> Dict[str, TokenGroup]:
        readouts = list(self.readouts.keys()) if readouts is None else readouts
        assert set(readouts).issubset(self.readouts.keys()), (
            "readouts must be specified in the model config"
        )
        assert not self.transformer_kwargs.get(
            "add_position_embedding", False
        ), "Positional embeddings are already added to the tokens"

        batch_size, horizon = (
            jax.tree_util.tree_leaves(observations)[0].shape[:2]
        )
        assert horizon <= self.max_horizon, "horizon must be <= max_horizon"

        prefix_groups = [self._language_prefix(tasks)]
        timestep_groups = self._observation_groups(
            observations, tasks, timestep_pad_mask, train
        )

        if self.repeat_task_tokens:
            # surface the task tokens at every timestep so later timesteps
            # can attend to them under the blockwise-causal mask
            ws = timestep_groups[0].tokens.shape[1]
            for task_group in prefix_groups:
                timestep_groups.append(TimestepGroup(
                    tokens=jnp.tile(
                        task_group.tokens[:, None], [1, ws, 1, 1]
                    ),
                    mask=jnp.tile(task_group.mask[:, None], [1, ws, 1]),
                    name=f"obs_{task_group.name}",
                    attention_rules=_RULES_OBS,
                ))

        timestep_groups += [
            self._readout_group(r, batch_size, horizon) for r in readouts
        ]

        prefix_outputs, timestep_outputs = BlockTransformer(
            self.transformer_kwargs,
            use_correct_attention=self.use_correct_attention,
        )(prefix_groups, timestep_groups, train=train, verbose=verbose)

        as_token_group = lambda g: TokenGroup(g.tokens, g.mask)  # noqa: E731
        outputs = {g.name: as_token_group(g) for g in prefix_outputs}
        outputs.update(
            {g.name: as_token_group(g) for g in timestep_outputs}
        )
        if prefix_outputs:
            outputs["task"] = TokenGroup.concatenate(
                [as_token_group(g) for g in prefix_outputs]
            )
        outputs["obs"] = TokenGroup.concatenate(
            [
                as_token_group(g) for g in timestep_outputs
                if g.name.startswith("obs_")
            ],
            axis=-2,
        )
        return outputs


class OctoModule(nn.Module):
    """OctoTransformer bundled with its prediction heads."""

    octo_transformer: OctoTransformer
    heads: Dict[str, nn.Module]

    def __call__(self, observations, tasks, timestep_pad_mask, train=True,
                 verbose=False):
        transformer_outputs = self.octo_transformer(
            observations, tasks, timestep_pad_mask, train=train,
            verbose=verbose,
        )
        head_outputs = {
            name: head(transformer_outputs, train=train)
            for name, head in self.heads.items()
        }
        return transformer_outputs, head_outputs

    @classmethod
    def create(
        cls,
        observation_tokenizers: Dict[str, ModuleSpec],
        heads: Dict[str, ModuleSpec],
        readouts: Dict[str, int],
        transformer_kwargs: Dict,
        token_embedding_size: int,
        max_horizon: int,
        repeat_task_tokens: bool = False,
        use_correct_attention: bool = False,
        task_tokenizers: Optional[Dict[str, ModuleSpec]] = None,
        use_pretrained_image_tokenizer: bool = False,
    ) -> "OctoModule":
        instantiate = lambda specs: {  # noqa: E731
            k: ModuleSpec.instantiate(spec)() for k, spec in specs.items()
        }
        return cls(
            octo_transformer=OctoTransformer(
                observation_tokenizers=instantiate(observation_tokenizers),
                readouts=readouts,
                token_embedding_size=token_embedding_size,
                max_horizon=max_horizon,
                repeat_task_tokens=repeat_task_tokens,
                transformer_kwargs=transformer_kwargs,
                use_correct_attention=use_correct_attention,
                use_pretrained_image_tokenizer=(
                    use_pretrained_image_tokenizer
                ),
            ),
            heads=instantiate(heads),
        )
