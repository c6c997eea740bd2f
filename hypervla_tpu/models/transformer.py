"""ViT-style transformer encoder stack.

Behavioral parity with the reference's forked transformer
(hypervla/components/transformer.py:14-347): pre-LN encoder blocks with
GELU MLPs, a `learnable_norm` switch that strips LayerNorm scale/bias,
optional differential attention, optional attention-map return, and the
`common_transformer_sizes` registry. TPU-first choices: a configurable
compute dtype (bfloat16 on the MXU by default at inference), a single
attention module that can always surface its probabilities, and no Python
control flow that depends on traced values.

Module/param names that appear in checkpoint paths (encoderblock_N,
encoder_norm, posembed_input, probe, and the auto-named submodules) are
pinned — the reference-parity goldens load through them.
"""
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.models.attention import (
    DifferentialAttention,
    MultiHeadAttention,
)
from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.typing import Dtype, PRNGKey, Shape

_xavier = nn.initializers.xavier_uniform


class AddPositionEmbs(nn.Module):
    """Adds a learned (1, seq, emb) positional table."""

    posemb_init: Callable[[PRNGKey, Shape, Dtype], jax.Array]

    @nn.compact
    def __call__(self, inputs):
        assert inputs.ndim == 3, (
            f"expected (batch, seq, emb), got {inputs.shape}"
        )
        table = self.param(
            "pos_embedding", self.posemb_init, (1,) + inputs.shape[1:]
        )
        return inputs + table


class MlpBlock(nn.Module):
    """Feed-forward block: widen -> GELU -> dropout -> project -> dropout."""

    mlp_dim: int
    out_dim: Optional[int] = None
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32
    kernel_init: Callable = _xavier()
    bias_init: Callable = nn.initializers.normal(stddev=1e-6)

    @nn.compact
    def __call__(self, inputs, *, deterministic):
        def dense(width):
            return nn.Dense(
                width, dtype=self.dtype,
                kernel_init=self.kernel_init, bias_init=self.bias_init,
            )

        def drop(h):
            return nn.Dropout(rate=self.dropout_rate)(
                h, deterministic=deterministic
            )

        hidden = drop(nn.gelu(dense(self.mlp_dim)(inputs)))
        return drop(dense(self.out_dim or inputs.shape[-1])(hidden))


class MAPHead(nn.Module):
    """Multihead attention pooling: learned probe tokens cross-attend into
    the sequence, followed by a residual MLP."""

    num_readouts: int = 1
    num_heads: int = 8
    mlp_dim: Optional[int] = None  # defaults to 4x input dim

    @nn.compact
    def __call__(self, x, train=True):
        mask = None
        if isinstance(x, TokenGroup):
            x, mask = x.tokens, x.mask
        *lead, seq, dim = x.shape
        x = x.reshape(-1, seq, dim)
        flat_batch = x.shape[0]

        probe = jnp.tile(
            self.param(
                "probe", _xavier(), (1, self.num_readouts, dim), x.dtype
            ),
            [flat_batch, 1, 1],
        )
        if mask is not None:
            mask = jnp.broadcast_to(
                mask.reshape(-1, seq)[:, None, None, :],
                (flat_batch, 1, self.num_readouts, seq),
            )

        pooled = MultiHeadAttention(
            num_heads=self.num_heads, kernel_init=_xavier()
        )(probe, x, mask=mask)
        pooled = pooled + MlpBlock(mlp_dim=self.mlp_dim or 4 * dim)(
            nn.LayerNorm()(pooled), deterministic=not train
        )
        return pooled.reshape(*lead, self.num_readouts, dim)


class Encoder1DBlock(nn.Module):
    """Pre-LN transformer encoder layer.

    Returns (output, attention_map); attention_map is 0.0 unless the block
    is configured to surface it (differential attention always does).
    """

    embedding_dim: int
    mlp_dim: int
    num_heads: int
    layer_depth: int = 0
    learnable_norm: bool = True
    use_differential_transformer: bool = False
    return_attention_map: bool = False
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def _norm(self):
        return nn.LayerNorm(
            use_scale=self.learnable_norm, use_bias=self.learnable_norm,
            dtype=self.dtype,
        )

    def _attend(self, x, attention_mask, deterministic):
        if self.use_differential_transformer:
            return DifferentialAttention(
                embed_dim=self.embedding_dim,
                num_heads=self.num_heads,
                depth=self.layer_depth,
            )(x, attn_mask=attention_mask)
        out, probs = MultiHeadAttention(
            dtype=self.dtype,
            kernel_init=_xavier(),
            dropout_rate=self.attention_dropout_rate,
            num_heads=self.num_heads,
        )(x, x, mask=attention_mask, deterministic=deterministic,
          return_weights=True)
        sow_name = (
            "attention_map" if self.return_attention_map
            else "attention_weights"
        )
        self.sow("intermediates", sow_name, probs)
        return out, probs

    @nn.compact
    def __call__(self, inputs, attention_mask, *, deterministic):
        assert inputs.ndim == 3, (
            f"expected (batch, seq, hidden), got {inputs.shape}"
        )
        attended, attention_map = self._attend(
            self._norm()(inputs), attention_mask, deterministic
        )
        attended = nn.Dropout(rate=self.dropout_rate)(
            attended, deterministic=deterministic
        )
        x = inputs + attended

        x = x + MlpBlock(
            mlp_dim=self.mlp_dim, dtype=self.dtype,
            dropout_rate=self.dropout_rate,
        )(self._norm()(x), deterministic=deterministic)

        surfaced = (
            self.use_differential_transformer or self.return_attention_map
        )
        return x, (attention_map if surfaced else 0.0)


class Transformer(nn.Module):
    """Encoder stack; returns (encoded, last_layer_attention_map)."""

    embedding_dim: int
    num_layers: int
    mlp_dim: int
    num_attention_heads: int
    learnable_norm: bool = True
    add_position_embedding: bool = False
    use_differential_transformer: bool = False
    return_attention_map: bool = False
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, *, train):
        assert x.ndim == 3  # (batch, len, emb)
        if self.add_position_embedding:
            x = AddPositionEmbs(
                posemb_init=nn.initializers.normal(stddev=0.02),
                name="posembed_input",
            )(x)
            x = nn.Dropout(rate=self.dropout_rate)(
                x, deterministic=not train
            )

        attention_map = 0.0
        for depth in range(self.num_layers):
            x, attention_map = Encoder1DBlock(
                name=f"encoderblock_{depth}",
                embedding_dim=self.embedding_dim,
                mlp_dim=self.mlp_dim,
                num_heads=self.num_attention_heads,
                dtype=self.dtype,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                learnable_norm=self.learnable_norm,
                use_differential_transformer=(
                    self.use_differential_transformer
                ),
                layer_depth=depth,
                return_attention_map=self.return_attention_map,
            )(x, attention_mask, deterministic=not train)
        encoded = nn.LayerNorm(
            name="encoder_norm",
            use_scale=self.learnable_norm,
            use_bias=self.learnable_norm,
        )(x)
        return encoded, attention_map


# name -> (token_dim, num_layers, mlp_dim, heads, dropout)
_SIZE_TABLE = {
    "dummy": (256, 1, 256, 2, 0.1),
    "vanilla": (256, 4, 1024, 8, 0.1),
    "vit_t": (192, 12, 768, 3, 0.0),
    "vit_s": (384, 12, 1536, 6, 0.0),
    "vit_b": (768, 12, 3072, 12, 0.0),
    "vit_l": (1024, 24, 4096, 16, 0.1),
    "vit_h": (1280, 32, 5120, 16, 0.1),
}


def common_transformer_sizes(transformer_size: str) -> Tuple[int, dict]:
    """Named transformer sizes (same table as the reference registry,
    hypervla/components/transformer.py:265-347)."""
    assert transformer_size in _SIZE_TABLE, (
        f"unknown transformer size {transformer_size}"
    )
    token_dim, layers, mlp_dim, heads, dropout = _SIZE_TABLE[transformer_size]
    return token_dim, {
        "attention_dropout_rate": 0.0,
        "add_position_embedding": False,
        "num_layers": layers,
        "mlp_dim": mlp_dim,
        "num_attention_heads": heads,
        "dropout_rate": dropout,
    }
