"""Attention primitives.

A single multi-head attention module owns the whole compute path so that we
can (a) always recover the attention probabilities when asked (parity:
hypervla/components/multi_head_attetion.py:7-109 and the `sow_weights=True`
path in hypervla/components/transformer.py:183-191), and (b) route the
softmax(QK^T)V contraction through a fused Pallas TPU kernel when profitable.

Parameter layout and initialization match `flax.linen.MultiHeadDotProductAttention`
(DenseGeneral query/key/value with kernel shape (in, heads, head_dim) and an
`out` DenseGeneral with kernel shape (heads, head_dim, out)), so checkpoints
keep the familiar {query,key,value,out} structure.
"""
import functools
import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.typing import Dtype


def dot_product_attention_weights(
    query: jax.Array,
    key: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    dtype: Dtype = jnp.float32,
) -> jax.Array:
    """Computes softmax(Q K^T / sqrt(d)) with boolean masking.

    query: (..., q_len, heads, head_dim)
    key:   (..., kv_len, heads, head_dim)
    mask:  broadcastable to (..., heads, q_len, kv_len); True = attend.
    Returns attention probabilities (..., heads, q_len, kv_len).
    """
    depth = query.shape[-1]
    query = query / jnp.sqrt(depth).astype(dtype)
    weights = jnp.einsum("...qhd,...khd->...hqk", query, key)
    if mask is not None:
        neg = jnp.finfo(weights.dtype).min
        weights = jnp.where(mask, weights, neg)
    return jax.nn.softmax(weights, axis=-1).astype(dtype)


class MultiHeadAttention(nn.Module):
    """Multi-head dot-product self/cross attention.

    Equivalent math + init to flax's MultiHeadDotProductAttention with
    broadcast_dropout=False, plus the ability to return attention weights.
    """

    num_heads: int
    dtype: Dtype = jnp.float32
    qkv_features: Optional[int] = None
    out_features: Optional[int] = None
    dropout_rate: float = 0.0
    kernel_init: Callable = nn.initializers.xavier_uniform()
    bias_init: Callable = nn.initializers.zeros
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        inputs_q: jax.Array,
        inputs_kv: jax.Array,
        mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        features = self.out_features or inputs_q.shape[-1]
        qkv_features = self.qkv_features or inputs_q.shape[-1]
        assert qkv_features % self.num_heads == 0, (
            f"qkv_features {qkv_features} not divisible by {self.num_heads} heads"
        )
        head_dim = qkv_features // self.num_heads

        dense = functools.partial(
            nn.DenseGeneral,
            axis=-1,
            dtype=self.dtype,
            features=(self.num_heads, head_dim),
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            use_bias=self.use_bias,
        )
        query = dense(name="query")(inputs_q)
        key = dense(name="key")(inputs_kv)
        value = dense(name="value")(inputs_kv)

        weights = dot_product_attention_weights(query, key, mask, dtype=self.dtype)

        if self.dropout_rate > 0.0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout_rate, weights.shape
            )
            weights = weights * keep / (1.0 - self.dropout_rate)

        x = jnp.einsum("...hqk,...khd->...qhd", weights, value)
        out = nn.DenseGeneral(
            features=features,
            axis=(-2, -1),
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="out",
        )(x)
        if return_weights:
            return out, weights
        return out


def lambda_init_fn(depth: int) -> float:
    """Depth-dependent lambda initialization from the Differential Transformer
    paper (parity: hypervla/components/differential_transformer.py:75-79)."""
    return 0.8 - 0.6 * math.exp(-0.3 * depth)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        normed = x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + self.eps)
        if self.elementwise_affine:
            weight = self.param("weight", nn.initializers.ones, (self.dim,))
            normed = normed * weight
        return normed


class DifferentialAttention(nn.Module):
    """Differential attention: A = softmax(Q1 K1^T) - lambda * softmax(Q2 K2^T).

    Parity: hypervla/components/differential_transformer.py:99-252, with one
    deliberate fix: the reference adds a *boolean* mask directly onto the
    logits (a no-op +1 bias); we convert boolean masks into additive -inf so
    masked positions are actually excluded. Like the reference, logits are NOT
    scaled by 1/sqrt(head_dim) (the learned projections absorb the scale).
    Returns (output, attention_map) where attention_map is the differential
    distribution of shape (batch, heads, q_len, kv_len).
    """

    embed_dim: int
    num_heads: int  # half the equivalent vanilla head count
    num_kv_heads: Optional[int] = None
    depth: int = 0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: Optional[jax.Array] = None):
        kv_heads = self.num_kv_heads or self.num_heads
        n_rep = self.num_heads // kv_heads
        head_dim = self.embed_dim // (2 * self.num_heads)
        bsz, seq, _ = x.shape

        q = nn.Dense(self.embed_dim, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.embed_dim // n_rep, use_bias=False, name="k_proj")(x)
        v = nn.Dense(self.embed_dim // n_rep, use_bias=False, name="v_proj")(x)

        q = q.reshape(bsz, seq, self.num_heads, 2, head_dim)
        k = k.reshape(bsz, seq, kv_heads, 2, head_dim)
        v = v.reshape(bsz, seq, kv_heads, 2 * head_dim)
        q1, q2 = q[..., 0, :], q[..., 1, :]
        k1, k2 = k[..., 0, :], k[..., 1, :]
        if n_rep > 1:
            k1 = jnp.repeat(k1, n_rep, axis=2)
            k2 = jnp.repeat(k2, n_rep, axis=2)
            v = jnp.repeat(v, n_rep, axis=2)

        logits1 = jnp.einsum("bthd,bshd->bhts", q1, k1)
        logits2 = jnp.einsum("bthd,bshd->bhts", q2, k2)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_ or jnp.issubdtype(
                attn_mask.dtype, jnp.integer
            ):
                neg = jnp.finfo(logits1.dtype).min
                logits1 = jnp.where(attn_mask, logits1, neg)
                logits2 = jnp.where(attn_mask, logits2, neg)
            else:
                logits1 = logits1 + attn_mask
                logits2 = logits2 + attn_mask
        a1 = jax.nn.softmax(logits1, axis=-1)
        a2 = jax.nn.softmax(logits2, axis=-1)

        init_std = 0.1
        lambda_q1 = self.param(
            "lambda_q1", nn.initializers.normal(init_std), (head_dim,)
        )
        lambda_k1 = self.param(
            "lambda_k1", nn.initializers.normal(init_std), (head_dim,)
        )
        lambda_q2 = self.param(
            "lambda_q2", nn.initializers.normal(init_std), (head_dim,)
        )
        lambda_k2 = self.param(
            "lambda_k2", nn.initializers.normal(init_std), (head_dim,)
        )
        lambda_init = lambda_init_fn(self.depth)
        lambda_full = (
            jnp.exp(jnp.sum(lambda_q1 * lambda_k1))
            - jnp.exp(jnp.sum(lambda_q2 * lambda_k2))
            + lambda_init
        )

        attn = a1 - lambda_full * a2
        out = jnp.einsum("bhts,bshd->bthd", attn, v)
        out = RMSNorm(2 * head_dim, eps=self.eps, name="subln")(out)
        out = out * (1.0 - lambda_init)
        out = out.reshape(bsz, seq, self.embed_dim)
        out = nn.Dense(self.embed_dim, use_bias=False, name="out_proj")(out)
        return out, attn
