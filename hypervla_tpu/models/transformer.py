"""ViT-style transformer encoder stack.

Behavioral parity with the reference's forked transformer
(hypervla/components/transformer.py:14-347): pre-LN encoder blocks with
GELU MLPs, a `learnable_norm` switch that strips LayerNorm scale/bias,
optional differential attention, optional attention-map return, and the
`common_transformer_sizes` registry. TPU-first choices: a configurable
compute dtype (bfloat16 on the MXU by default at inference), a single
attention module that can always surface its probabilities, and no Python
control flow that depends on traced values.
"""
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.models.attention import DifferentialAttention, MultiHeadAttention
from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.typing import Dtype, PRNGKey, Shape


class AddPositionEmbs(nn.Module):
    """Adds learned positional embeddings (parity: transformer.py:14-39)."""

    posemb_init: Callable[[PRNGKey, Shape, Dtype], jax.Array]

    @nn.compact
    def __call__(self, inputs):
        assert inputs.ndim == 3, f"expected (batch, seq, emb), got {inputs.shape}"
        pe = self.param(
            "pos_embedding", self.posemb_init, (1, inputs.shape[1], inputs.shape[2])
        )
        return inputs + pe


class MlpBlock(nn.Module):
    """Transformer feed-forward block (parity: transformer.py:42-75)."""

    mlp_dim: int
    dtype: Dtype = jnp.float32
    out_dim: Optional[int] = None
    dropout_rate: float = 0.1
    kernel_init: Callable = nn.initializers.xavier_uniform()
    bias_init: Callable = nn.initializers.normal(stddev=1e-6)

    @nn.compact
    def __call__(self, inputs, *, deterministic):
        out_dim = self.out_dim if self.out_dim is not None else inputs.shape[-1]
        x = nn.Dense(
            self.mlp_dim,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
        )(inputs)
        x = nn.gelu(x)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            out_dim,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
        )(x)
        return nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)


class MAPHead(nn.Module):
    """Multihead attention pooling (parity: transformer.py:78-124)."""

    mlp_dim: Optional[int] = None  # defaults to 4x input dim
    num_heads: int = 8
    num_readouts: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        if isinstance(x, TokenGroup):
            x, mask = x.tokens, x.mask
        else:
            mask = None
        *batch_dims, seq, dim = x.shape
        x = x.reshape(-1, seq, dim)
        batch = x.shape[0]

        probe = self.param(
            "probe",
            nn.initializers.xavier_uniform(),
            (1, self.num_readouts, dim),
            x.dtype,
        )
        probe = jnp.tile(probe, [batch, 1, 1])

        if mask is not None:
            mask = mask.reshape(-1, seq)
            mask = jnp.broadcast_to(
                mask[:, None, None, :], (batch, 1, self.num_readouts, seq)
            )

        out = MultiHeadAttention(
            num_heads=self.num_heads, kernel_init=nn.initializers.xavier_uniform()
        )(probe, x, mask=mask)
        y = nn.LayerNorm()(out)
        out = out + MlpBlock(mlp_dim=self.mlp_dim or 4 * dim)(
            y, deterministic=not train
        )
        return out.reshape(*batch_dims, self.num_readouts, dim)


class Encoder1DBlock(nn.Module):
    """Pre-LN transformer encoder layer (parity: transformer.py:127-201).

    Returns (output, attention_map). attention_map is 0.0 unless the block is
    configured to surface it (differential attention always surfaces it).
    """

    embedding_dim: int
    mlp_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    learnable_norm: bool = True
    use_differential_transformer: bool = False
    layer_depth: int = 0
    return_attention_map: bool = False

    @nn.compact
    def __call__(self, inputs, attention_mask, *, deterministic):
        assert inputs.ndim == 3, f"expected (batch, seq, hidden), got {inputs.shape}"
        x = nn.LayerNorm(
            use_scale=self.learnable_norm, use_bias=self.learnable_norm,
            dtype=self.dtype,
        )(inputs)
        if self.use_differential_transformer:
            x, attention_map = DifferentialAttention(
                embed_dim=self.embedding_dim,
                num_heads=self.num_heads,
                depth=self.layer_depth,
            )(x, attn_mask=attention_mask)
        else:
            x, attention_map = MultiHeadAttention(
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                dropout_rate=self.attention_dropout_rate,
                num_heads=self.num_heads,
            )(x, x, mask=attention_mask, deterministic=deterministic,
              return_weights=True)
            if self.return_attention_map:
                self.sow("intermediates", "attention_map", attention_map)
            else:
                self.sow("intermediates", "attention_weights", attention_map)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        x = x + inputs

        y = nn.LayerNorm(
            use_scale=self.learnable_norm, use_bias=self.learnable_norm,
            dtype=self.dtype,
        )(x)
        y = MlpBlock(
            mlp_dim=self.mlp_dim, dtype=self.dtype, dropout_rate=self.dropout_rate
        )(y, deterministic=deterministic)

        if not (self.use_differential_transformer or self.return_attention_map):
            attention_map = 0.0
        return x + y, attention_map


class Transformer(nn.Module):
    """Transformer encoder stack (parity: transformer.py:204-262).

    Returns (encoded, last_layer_attention_map).
    """

    embedding_dim: int
    num_layers: int
    mlp_dim: int
    num_attention_heads: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    add_position_embedding: bool = False
    learnable_norm: bool = True
    use_differential_transformer: bool = False
    return_attention_map: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, *, train):
        assert x.ndim == 3  # (batch, len, emb)
        if self.add_position_embedding:
            x = AddPositionEmbs(
                posemb_init=nn.initializers.normal(stddev=0.02),
                name="posembed_input",
            )(x)
            x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)

        attention_map = 0.0
        for lyr in range(self.num_layers):
            x, attention_map = Encoder1DBlock(
                embedding_dim=self.embedding_dim,
                mlp_dim=self.mlp_dim,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                name=f"encoderblock_{lyr}",
                num_heads=self.num_attention_heads,
                learnable_norm=self.learnable_norm,
                use_differential_transformer=self.use_differential_transformer,
                layer_depth=lyr,
                return_attention_map=self.return_attention_map,
                dtype=self.dtype,
            )(x, attention_mask, deterministic=not train)
        encoded = nn.LayerNorm(
            name="encoder_norm",
            use_scale=self.learnable_norm,
            use_bias=self.learnable_norm,
        )(x)
        return encoded, attention_map


def common_transformer_sizes(transformer_size: str) -> Tuple[int, dict]:
    """Named transformer sizes (parity: transformer.py:265-347)."""
    default_params = {
        "attention_dropout_rate": 0.0,
        "add_position_embedding": False,
    }
    sizes = {
        "dummy": dict(num_layers=1, mlp_dim=256, num_attention_heads=2,
                      dropout_rate=0.1),
        "vanilla": dict(num_layers=4, mlp_dim=1024, num_attention_heads=8,
                        dropout_rate=0.1),
        "vit_t": dict(num_layers=12, mlp_dim=768, num_attention_heads=3,
                      dropout_rate=0.0),
        "vit_s": dict(num_layers=12, mlp_dim=1536, num_attention_heads=6,
                      dropout_rate=0.0),
        "vit_b": dict(num_layers=12, mlp_dim=3072, num_attention_heads=12,
                      dropout_rate=0.0),
        "vit_l": dict(num_layers=24, mlp_dim=4096, num_attention_heads=16,
                      dropout_rate=0.1),
        "vit_h": dict(num_layers=32, mlp_dim=5120, num_attention_heads=16,
                      dropout_rate=0.1),
    }
    token_dims = {
        "dummy": 256, "vanilla": 256, "vit_t": 192, "vit_s": 384,
        "vit_b": 768, "vit_l": 1024, "vit_h": 1280,
    }
    assert transformer_size in sizes, f"unknown transformer size {transformer_size}"
    return token_dims[transformer_size], {**default_params, **sizes[transformer_size]}
