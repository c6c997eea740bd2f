"""Octo transformer used as a (generated) base network.

Parity: hypervla/components/base_octo.py — the Octo architecture with the
hypervla deltas: the language prefix is fed as precomputed (frozen) T5 token
embeddings rather than tokenized in-model, and `use_pretrained_image_tokenizer`
lets precomputed patch tokens replace the conv image tokenizer. The blockwise
causal sequence is [task tokens, obs t=0 + readout t=0, obs t=1 + ...].
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


class OctoTransformer(nn.Module):
    observation_tokenizers: Dict[str, nn.Module]
    readouts: Dict[str, int]
    transformer_kwargs: Dict
    token_embedding_size: int
    max_horizon: int
    repeat_task_tokens: bool
    use_correct_attention: bool = False
    use_pretrained_image_tokenizer: bool = False

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
        if readouts is None:
            readouts = list(self.readouts.keys())
        assert set(readouts).issubset(set(self.readouts.keys())), (
            "readouts must be specified in the model config"
        )

        batch_size, horizon = jax.tree_util.tree_leaves(observations)[0].shape[:2]
        assert horizon <= self.max_horizon, "horizon must be <= max_horizon"

        task_attention_rules = {"task_*": AttentionRule.CAUSAL}
        observation_attention_rules = {
            "task_*": AttentionRule.CAUSAL,
            "obs_*": AttentionRule.CAUSAL,
        }

        all_prefix_groups = []
        all_timestep_groups = []

        # task prefix: precomputed language token embeddings
        group_name = "task_language"
        instruction_tokens = jax.lax.stop_gradient(
            tasks["language_instruction"]["token_embedding"]
        )
        instruction_tokens = nn.Dense(
            self.token_embedding_size, name=f"{group_name}_projection"
        )(instruction_tokens)
        instruction_tokens += self._create_positional_embedding(
            group_name, instruction_tokens
        )
        mask = tasks["pad_mask_dict"]["language_instruction"]
        mask = jnp.broadcast_to(mask[:, None], instruction_tokens.shape[:-1])
        all_prefix_groups.append(
            PrefixGroup(
                tokens=instruction_tokens,
                mask=mask,
                name=group_name,
                attention_rules=task_attention_rules,
            )
        )

        # observation tokens
        if self.use_pretrained_image_tokenizer:
            group_name = "obs_primary"
            tokens = jax.lax.stop_gradient(
                observations["image_patches"]["token"]
            )
            patch_mask = jax.lax.stop_gradient(
                observations["image_patches"]["mask"]
            )
            obs_tokens = nn.Dense(
                self.token_embedding_size, name=f"{group_name}_projection"
            )(tokens)
            obs_tokens += self._create_positional_embedding(
                group_name, obs_tokens
            )
            obs_pad_mask = jnp.logical_and(
                timestep_pad_mask[:, :, None], patch_mask
            )
            all_timestep_groups.append(
                TimestepGroup(
                    tokens=obs_tokens,
                    mask=obs_pad_mask,
                    name=group_name,
                    attention_rules=observation_attention_rules,
                )
            )
        else:
            for name, tok in self.observation_tokenizers.items():
                group_name = f"obs_{name}"
                tokenizer_output = tok(observations, tasks, train=train)
                if tokenizer_output is None:
                    logging.warning(f"Skipping observation tokenizer: {group_name}")
                    continue
                obs_tokens = nn.Dense(
                    self.token_embedding_size, name=f"{group_name}_projection"
                )(tokenizer_output.tokens)
                obs_tokens += self._create_positional_embedding(
                    group_name, obs_tokens
                )
                obs_pad_mask = jnp.logical_and(
                    timestep_pad_mask[:, :, None], tokenizer_output.mask
                )
                all_timestep_groups.append(
                    TimestepGroup(
                        tokens=obs_tokens,
                        mask=obs_pad_mask,
                        name=group_name,
                        attention_rules=observation_attention_rules,
                    )
                )

        if self.repeat_task_tokens:
            # repeat task tokens at each timestep for cross-modal attention
            for task_group in all_prefix_groups:
                ws = all_timestep_groups[0].tokens.shape[1]
                task_tokens = jnp.tile(
                    task_group.tokens[:, None, :, :], [1, ws, 1, 1]
                )
                task_pad_mask = jnp.tile(task_group.mask[:, None, :], [1, ws, 1])
                all_timestep_groups.append(
                    TimestepGroup(
                        tokens=task_tokens,
                        mask=task_pad_mask,
                        name=f"obs_{task_group.name}",
                        attention_rules=observation_attention_rules,
                    )
                )

        # readout tokens: pure positional embeddings reading the sequence
        for readout_name in readouts:
            group_name = f"readout_{readout_name}"
            n_tokens_for_readout = self.readouts[readout_name]
            readout_tokens = jnp.zeros(
                (batch_size, horizon, n_tokens_for_readout,
                 self.token_embedding_size)
            )
            readout_tokens += self._create_positional_embedding(
                group_name, readout_tokens
            )
            readout_mask = jnp.ones(
                (batch_size, horizon, n_tokens_for_readout), dtype=bool
            )
            readout_attention_rules = {
                "task_*": AttentionRule.CAUSAL,
                "obs_*": AttentionRule.CAUSAL,
                group_name: AttentionRule.CAUSAL,
            }
            all_timestep_groups.append(
                TimestepGroup(
                    tokens=readout_tokens,
                    mask=readout_mask,
                    name=group_name,
                    attention_rules=readout_attention_rules,
                )
            )

        assert (
            self.transformer_kwargs.get("add_position_embedding", False) is False
        ), "Positional embeddings are already added to the tokens"

        prefix_outputs, timestep_outputs = BlockTransformer(
            self.transformer_kwargs,
            use_correct_attention=self.use_correct_attention,
        )(all_prefix_groups, all_timestep_groups, train=train, verbose=verbose)

        outputs = {
            group.name: TokenGroup(group.tokens, group.mask)
            for group in prefix_outputs
        }
        outputs.update(
            {
                group.name: TokenGroup(group.tokens, group.mask)
                for group in timestep_outputs
            }
        )
        if len(prefix_outputs) > 0:
            outputs["task"] = TokenGroup.concatenate(
                [TokenGroup(g.tokens, g.mask) for g in prefix_outputs]
            )
        outputs["obs"] = TokenGroup.concatenate(
            [
                TokenGroup(g.tokens, g.mask)
                for g in timestep_outputs
                if g.name.startswith("obs_")
            ],
            axis=-2,
        )
        return outputs

    def _create_positional_embedding(self, name: str, tokens: jax.Array):
        if tokens.ndim == 3:  # prefix
            shape = (1, *tokens.shape[-2:])
        elif tokens.ndim == 4:  # timestep: embed max_horizon, truncate
            shape = (1, self.max_horizon, *tokens.shape[-2:])
        else:
            raise ValueError(f"Invalid tokens shape: {tokens.shape}")
        embedding = self.param(
            f"{name}_pos_embedding", nn.initializers.normal(stddev=0.02), shape
        )
        if tokens.ndim == 4:
            embedding = embedding[:, : tokens.shape[1]]
        return jnp.broadcast_to(embedding, tokens.shape)


class OctoModule(nn.Module):
    """OctoTransformer bundled with its prediction heads."""

    octo_transformer: OctoTransformer
    heads: Dict[str, nn.Module]

    def __call__(self, observations, tasks, timestep_pad_mask, train=True,
                 verbose=False):
        transformer_outputs = self.octo_transformer(
            observations, tasks, timestep_pad_mask, train=train, verbose=verbose
        )
        head_outputs = {
            head_name: head(transformer_outputs, train=train)
            for head_name, head in self.heads.items()
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
        observation_tokenizer_defs = {
            k: ModuleSpec.instantiate(spec)()
            for k, spec in observation_tokenizers.items()
        }
        head_defs = {
            k: ModuleSpec.instantiate(spec)() for k, spec in heads.items()
        }
        model_def = OctoTransformer(
            observation_tokenizers=observation_tokenizer_defs,
            readouts=readouts,
            token_embedding_size=token_embedding_size,
            max_horizon=max_horizon,
            repeat_task_tokens=repeat_task_tokens,
            transformer_kwargs=transformer_kwargs,
            use_correct_attention=use_correct_attention,
            use_pretrained_image_tokenizer=use_pretrained_image_tokenizer,
        )
        return cls(octo_transformer=model_def, heads=head_defs)
