"""Pallas TPU flash attention for the encoder trunks.

A fused softmax(Q K^T / sqrt(d)) V kernel with online (streaming) softmax:
one VMEM-resident pass per query block over the key blocks — no L x L
attention matrix ever hits HBM. Used by the DINOv2/CLIP/T5 trunks where the
sequence (257 tokens) and head dims map cleanly onto the MXU; falls back to
the XLA einsum path on CPU or when attention probabilities must be returned.

Layout: q, k, v are (batch*heads, seq, head_dim); seq is padded to the block
size and the true length is masked inside the kernel.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int,
                  sm_scale: float):
    q = q_ref[...].astype(jnp.float32) * sm_scale  # (block_q, d)
    block_q, head_dim = q.shape
    kv_len = k_ref.shape[0]
    num_k_blocks = kv_len // block_k

    def body(i, carry):
        acc, row_max, row_sum = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        # mask out key padding beyond the true sequence length
        col_ids = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        scores = jnp.where(col_ids < seq_len, scores, NEG_INF)

        new_max = jnp.maximum(row_max, jnp.max(scores, axis=-1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(scores - new_max)
        new_sum = row_sum * correction + jnp.sum(p, axis=-1, keepdims=True)
        new_acc = acc * correction + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return new_acc, new_max, new_sum

    acc = jnp.zeros((block_q, head_dim), jnp.float32)
    row_max = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    row_sum = jnp.zeros((block_q, 1), jnp.float32)
    acc, row_max, row_sum = jax.lax.fori_loop(
        0, num_k_blocks, body, (acc, row_max, row_sum)
    )
    o_ref[...] = (acc / row_sum).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Unmasked self/cross attention.

    q: (bh, q_len, d), k/v: (bh, kv_len, d). Returns (bh, q_len, d) in q's
    dtype. Sequence lengths are padded internally to the block sizes.
    """
    bh, q_len, head_dim = q.shape
    kv_len = k.shape[1]
    sm_scale = 1.0 / np.sqrt(head_dim)
    # Mosaic only targets TPU; interpret transparently on CPU (tests/dryruns)
    interpret = interpret or jax.default_backend() == "cpu"

    q_pad = _round_up(q_len, block_q)
    k_pad = _round_up(kv_len, block_k)
    if q_pad != q_len:
        q = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
    if k_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, k_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, k_pad - kv_len), (0, 0)))

    grid = (bh, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, seq_len=kv_len, sm_scale=sm_scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, head_dim), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, k_pad, head_dim), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, k_pad, head_dim), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, head_dim),
                               lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, head_dim), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :q_len]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def mha_flash(query, key, value, interpret: bool = False):
    """(batch, seq, heads, head_dim) multi-head wrapper around the kernel."""
    b, q_len, h, d = query.shape
    kv_len = key.shape[1]
    fold = lambda x, L: x.transpose(0, 2, 1, 3).reshape(b * h, L, d)
    out = flash_attention(
        fold(query, q_len), fold(key, kv_len), fold(value, kv_len),
        interpret=interpret,
    )
    return out.reshape(b, h, q_len, d).transpose(0, 2, 1, 3)


def mha_flash_trainable(query, key, value):
    """Differentiable multi-head flash attention for TRAINING.

    Wraps jax's TPU Pallas flash-attention (which ships a custom VJP that
    recomputes attention in the backward pass — the (heads, L, L)
    probability tensors never hit HBM, forward or backward). Inputs are
    (batch, seq, heads, head_dim) like mha_flash; the sequence is padded to
    the kernel's block size and padded keys are masked out via segment ids.
    Falls back to the XLA einsum path off-TPU.
    """
    b, seq, h, d = query.shape
    sm_scale = 1.0 / np.sqrt(d)
    if jax.default_backend() != "tpu":
        logits = jnp.einsum("bqhd,bkhd->bhqk", query * sm_scale, key)
        probs = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        ).astype(query.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, value)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as jax_flash,
    )

    block = 128
    seq_pad = _round_up(seq, block)
    pad = seq_pad - seq

    def to_bhsd(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)

    # valid tokens share segment 1; padding gets 0, so no valid query ever
    # attends a padded key
    ids = jnp.pad(
        jnp.ones((b, seq), jnp.int32), ((0, 0), (0, pad))
    )
    blk = lambda n: min(block, n)  # noqa: E731
    sizes = BlockSizes(
        block_q=blk(seq_pad), block_k_major=blk(seq_pad),
        block_k=blk(seq_pad), block_b=1,
        block_q_major_dkv=blk(seq_pad), block_k_major_dkv=blk(seq_pad),
        block_k_dkv=blk(seq_pad), block_q_dkv=blk(seq_pad),
        block_k_major_dq=blk(seq_pad), block_k_dq=blk(seq_pad),
        block_q_dq=blk(seq_pad),
    )
    out = jax_flash(
        to_bhsd(query), to_bhsd(key), to_bhsd(value),
        segment_ids=SegmentIds(q=ids, kv=ids),
        sm_scale=sm_scale,
        block_sizes=sizes,
    )
    return out.transpose(0, 2, 1, 3)[:, :seq]
