"""Native Flax T5 text encoder.

TPU-first reimplementation of the T5 encoder stack the reference uses for
instruction embedding (via HF FlaxT5EncoderModel inside octo's
LanguageTokenizer, see /root/reference/octo/model/components/tokenizers.py:186-194
and scripts/train.py:167-175). The parameter tree matches HF Flax T5
({shared/embedding, encoder/block/N/layer/{0,1}/..., final_layer_norm}) so
pretrained t5-base weights convert 1:1.

T5 specifics preserved: RMS layer norm (no bias, no mean subtraction),
no 1/sqrt(d_kv) attention scaling, relative position bias embedding on
block 0 shared across blocks, ReLU feed-forward.
"""
import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hypervla_tpu.typing import Dtype


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    initializer_factor: float = 1.0
    feed_forward_proj: str = "relu"


_NAMED_CONFIGS = {
    "t5-small": T5Config(d_model=512, d_ff=2048, num_layers=6, num_heads=8),
    "t5-base": T5Config(),
    "t5-large": T5Config(d_model=1024, d_ff=4096, num_layers=24, num_heads=16),
}


def t5_config(name: str) -> T5Config:
    key = name.split("/")[-1]
    if key not in _NAMED_CONFIGS:
        raise ValueError(f"unknown T5 config {name}")
    return _NAMED_CONFIGS[key]


class T5LayerNorm(nn.Module):
    """RMS norm: w * x / sqrt(mean(x^2) + eps)."""

    hidden_size: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.hidden_size,))
        variance = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(variance + self.eps)
        return (weight * x).astype(self.dtype)


def _relative_position_bucket(
    relative_position, num_buckets=32, max_distance=128
):
    """Bidirectional T5 relative position bucketing (static numpy — the
    sequence length is fixed under jit, so we precompute on host)."""
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(np.int32) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(n.astype(np.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


class _SelfAttention(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, attention_mask=None, position_bias=None):
        c = self.config
        inner_dim = c.num_heads * c.d_kv
        seq = hidden_states.shape[1]

        q_init = nn.initializers.normal(
            c.initializer_factor * (c.d_model * c.d_kv) ** -0.5
        )
        kv_init = nn.initializers.normal(c.initializer_factor * c.d_model**-0.5)
        o_init = nn.initializers.normal(c.initializer_factor * inner_dim**-0.5)

        def heads(x):
            return x.reshape(x.shape[:2] + (c.num_heads, c.d_kv))

        q = heads(nn.Dense(inner_dim, use_bias=False, kernel_init=q_init,
                           dtype=self.dtype, name="q")(hidden_states))
        k = heads(nn.Dense(inner_dim, use_bias=False, kernel_init=kv_init,
                           dtype=self.dtype, name="k")(hidden_states))
        v = heads(nn.Dense(inner_dim, use_bias=False, kernel_init=kv_init,
                           dtype=self.dtype, name="v")(hidden_states))

        if position_bias is None:
            if self.has_relative_attention_bias:
                rel_emb = self.param(
                    "relative_attention_bias",
                    nn.initializers.normal(
                        c.initializer_factor * c.d_model**-0.5
                    ),
                    (c.relative_attention_num_buckets, c.num_heads),
                )
                # static bucket table for this (fixed) sequence length
                ctx = np.arange(seq)[:, None]
                mem = np.arange(seq)[None, :]
                buckets = _relative_position_bucket(
                    mem - ctx,
                    num_buckets=c.relative_attention_num_buckets,
                    max_distance=c.relative_attention_max_distance,
                )
                position_bias = rel_emb[jnp.asarray(buckets)]  # (q, k, h)
                position_bias = position_bias.transpose(2, 0, 1)[None]
            else:
                position_bias = jnp.zeros(
                    (1, c.num_heads, seq, seq), dtype=self.dtype
                )

        # T5: no 1/sqrt(d) scaling
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        scores = scores + position_bias
        if attention_mask is not None:
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(attention_mask[:, None, None, :], scores, neg)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(out.shape[:2] + (-1,))
        out = nn.Dense(c.d_model, use_bias=False, kernel_init=o_init,
                       dtype=self.dtype, name="o")(out)
        return out, position_bias


class _Block(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, attention_mask=None, position_bias=None,
                 deterministic=True):
        c = self.config
        # layer 0: self-attention
        normed = T5LayerNorm(
            c.d_model, eps=c.layer_norm_epsilon, dtype=self.dtype,
            name="layer_0_layer_norm",
        )(hidden_states)
        attn_out, position_bias = _SelfAttention(
            c,
            has_relative_attention_bias=self.has_relative_attention_bias,
            dtype=self.dtype,
            name="layer_0_SelfAttention",
        )(normed, attention_mask=attention_mask, position_bias=position_bias)
        attn_out = nn.Dropout(rate=c.dropout_rate)(
            attn_out, deterministic=deterministic
        )
        hidden_states = hidden_states + attn_out

        # layer 1: feed-forward
        normed = T5LayerNorm(
            c.d_model, eps=c.layer_norm_epsilon, dtype=self.dtype,
            name="layer_1_layer_norm",
        )(hidden_states)
        wi_init = nn.initializers.normal(c.initializer_factor * c.d_model**-0.5)
        wo_init = nn.initializers.normal(c.initializer_factor * c.d_ff**-0.5)
        y = nn.Dense(c.d_ff, use_bias=False, kernel_init=wi_init,
                     dtype=self.dtype, name="layer_1_DenseReluDense_wi")(normed)
        y = nn.relu(y)
        y = nn.Dropout(rate=c.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(c.d_model, use_bias=False, kernel_init=wo_init,
                     dtype=self.dtype, name="layer_1_DenseReluDense_wo")(y)
        y = nn.Dropout(rate=c.dropout_rate)(y, deterministic=deterministic)
        return hidden_states + y, position_bias


class T5EncoderModel(nn.Module):
    """T5 encoder trunk: input_ids -> last_hidden_state (fp32)."""

    config: T5Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        c = self.config
        shared = self.param(
            "shared_embedding",
            nn.initializers.normal(c.initializer_factor * 1.0),
            (c.vocab_size, c.d_model),
        )
        x = jnp.take(shared, input_ids, axis=0).astype(self.dtype)
        x = nn.Dropout(rate=c.dropout_rate)(x, deterministic=deterministic)

        position_bias = None
        for i in range(c.num_layers):
            x, position_bias = _Block(
                c,
                has_relative_attention_bias=(i == 0),
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, attention_mask=attention_mask, position_bias=position_bias,
              deterministic=deterministic)

        x = T5LayerNorm(
            c.d_model, eps=c.layer_norm_epsilon, dtype=self.dtype,
            name="final_layer_norm",
        )(x)
        x = nn.Dropout(rate=c.dropout_rate)(x, deterministic=deterministic)
        return x.astype(jnp.float32)
