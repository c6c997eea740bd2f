"""TokenGroup: tokens + mask bundle (parity: octo/model/components/base.py:8-33)."""
from typing import Sequence

import flax
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TokenGroup:
    """A group of tokens with an optional per-token mask.

    tokens: (..., n_tokens, d)
    mask:   (..., n_tokens) boolean; True = valid. May be None for "all valid".
    """

    tokens: jax.Array
    mask: jax.Array = None

    @classmethod
    def create(cls, tokens: jax.Array, mask: jax.Array = None, **kwargs):
        if mask is None:
            mask = jnp.ones(tokens.shape[:-1], dtype=bool)
        assert mask.ndim == tokens.ndim - 1, "mask must have one fewer dim than tokens"
        return cls(tokens, mask, **kwargs)

    @classmethod
    def concatenate(cls, group_list: Sequence["TokenGroup"], axis: int = -2):
        data = jnp.concatenate([t.tokens for t in group_list], axis=axis)
        mask = jnp.concatenate(
            [
                t.mask
                if t.mask is not None
                else jnp.ones(t.tokens.shape[:-1], dtype=bool)
                for t in group_list
            ],
            axis=axis + 1 if axis < 0 else axis,
        )
        return cls(data, mask)
