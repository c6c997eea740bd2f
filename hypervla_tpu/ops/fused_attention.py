"""Fused multi-head attention for the TRAINING trunk (custom VJP).

Built against the round-3 bs=64 profile: the XLA einsum attention path
spends ~41 ms of the 168 ms flagship step on non-GEMM glue — head-major
transpose fusions (bf16[64,257,12,64]{1,3,2,0} and friends), fp32 softmax
stat fusions over [B,12,257,257], and probability cast round-trips.
jax's generic Pallas flash kernel loses at this geometry (257 tokens pad
to 384; backward recompute; measured 77% slower at bs=32 — PERF.md), so
this kernel is shaped to the trunk instead:

  * consumes q, k, v exactly as the QKV Dense layers emit them —
    [B, S, H*D] with heads on lanes — and emits the attention output the
    same way, so NO head-major transpose ever materializes;
  * Mosaic requires 128-lane blocks, so each grid program owns a
    128-lane slab = 128//D heads. Heads are separated with LANE MASKS,
    not slices: `dot(q*mask_h, k)` contracts all 128 lanes and the zeros
    kill the cross-head terms — every dot stays tile-aligned, and the
    MXU is 128 wide whether the contraction uses 64 or 128 of them, so
    the masked form costs the same as a perfect per-head slice;
  * scores/softmax stay in VMEM (fp32), probabilities are written ONCE
    in bf16 and reused by the backward kernel — the same residual the
    einsum path keeps (which additionally keeps the fp32 softmax output
    alive for backward: 202 MB/layer at bs=64);
  * numerics mirror the einsum path: bf16 score rounding, fp32 softmax,
    bf16 probabilities (backward uses the bf16 probabilities for the
    softmax VJP — grad cosine vs autodiff > 0.999, pinned by test).

Reference surface: hypervla/components/vit_encoders.py attention (the
reference runs torch SDPA); here the geometry is DINOv2-base under the
flagship recipe: S=257, D=64, H=12, B=64.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _lane_mask(d: int, h: int, lanes: int):
    """bf16 (1, lanes) 0/1 mask selecting head h's lanes [h*d, (h+1)*d)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    return ((lane >= h * d) & (lane < (h + 1) * d)).astype(jnp.bfloat16)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, p_ref, *, scale: float,
                d: int, hpb: int):
    bb = q_ref.shape[0]
    lanes = q_ref.shape[-1]
    for i in range(bb):
        q2 = q_ref[i] * jnp.bfloat16(scale)           # (S, lanes)
        k2 = k_ref[i]
        v2 = v_ref[i]
        out = None
        for h in range(hpb):
            mask = _lane_mask(d, h, lanes)
            s = jax.lax.dot_general(
                q2 * mask, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16).astype(jnp.float32)  # (S, S)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                jnp.bfloat16
            )
            p_ref[i, h] = p
            ov = jax.lax.dot_general(
                p, v2 * mask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)                      # (S, lanes), head h
            out = ov if out is None else out + ov
        o_ref[i] = out


def _bwd_kernel(q_ref, k_ref, v_ref, p_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, d: int, hpb: int):
    bb = q_ref.shape[0]
    lanes = q_ref.shape[-1]
    for i in range(bb):
        g2 = g_ref[i]
        v2 = v_ref[i]
        k2 = k_ref[i]
        q2s = q_ref[i] * jnp.bfloat16(scale)
        dq = dk = dv = None
        for h in range(hpb):
            mask = _lane_mask(d, h, lanes)
            p = p_ref[i, h]                             # (S, S) bf16
            gh = g2 * mask
            dvh = jax.lax.dot_general(
                p, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            dp = jax.lax.dot_general(
                gh, v2 * mask, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                           # (S, S) f32
            pf = p.astype(jnp.float32)
            dpp = dp * pf
            ds = (
                dpp - pf * jnp.sum(dpp, axis=-1, keepdims=True)
            ).astype(jnp.bfloat16)
            dqh = (
                jax.lax.dot_general(
                    ds, k2 * mask, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * jnp.float32(scale)
            ).astype(jnp.bfloat16)
            dkh = jax.lax.dot_general(
                ds, q2s * mask, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            dq = dqh if dq is None else dq + dqh
            dk = dkh if dk is None else dk + dkh
            dv = dvh if dv is None else dv + dvh
        dq_ref[i] = dq
        dk_ref[i] = dk
        dv_ref[i] = dv


def _geometry(b: int, hd: int, heads: int):
    d = hd // heads
    hpb = max(1, min(heads, 128 // d)) if d < 128 else 1
    # Mosaic lane blocks must be 128-divisible or the full dimension
    if (d * hpb) % 128 != 0 and d * hpb != hd:
        hpb = heads
    while heads % hpb:
        hpb += 1
    lanes = d * hpb
    for bb in (8, 4, 2, 1):
        if b % bb == 0:
            return d, hpb, lanes, bb
    return d, hpb, lanes, 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mha_fused_train(q, k, v, heads: int, scale: float):
    """Fused MHA over [B, S, H*D] bf16 operands; returns [B, S, H*D].

    Differentiable (custom VJP; bf16 probabilities are the residual).
    Use via DINOv2Model(fused_attention=True) on the bf16 training trunk.
    """
    o, _ = _mha_fwd(q, k, v, heads, scale)
    return o


def _mha_fwd(q, k, v, heads, scale):
    interpret = jax.default_backend() == "cpu"
    b, s, hd = q.shape
    d, hpb, lanes, bb = _geometry(b, hd, heads)
    grid = (heads // hpb, b // bb)
    sl = pl.BlockSpec((bb, s, lanes), lambda j, i: (i, 0, j))
    o, p = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, d=d, hpb=hpb),
        grid=grid,
        in_specs=[sl, sl, sl],
        out_specs=[
            sl,
            pl.BlockSpec((bb, hpb, s, s), lambda j, i: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, hd), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, heads, s, s), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(q, k, v)
    return o, (q, k, v, p)


def _mha_bwd(heads, scale, res, g):
    q, k, v, p = res
    interpret = jax.default_backend() == "cpu"
    b, s, hd = q.shape
    d, hpb, lanes, bb = _geometry(b, hd, heads)
    grid = (heads // hpb, b // bb)
    sl = pl.BlockSpec((bb, s, lanes), lambda j, i: (i, 0, j))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, d=d, hpb=hpb),
        grid=grid,
        in_specs=[
            sl, sl, sl,
            pl.BlockSpec((bb, hpb, s, s), lambda j, i: (i, j, 0, 0)),
            sl,
        ],
        out_specs=[sl, sl, sl],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, hd), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, s, hd), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, s, hd), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(q, k, v, p, g)
    return dq, dk, dv


mha_fused_train.defvjp(_mha_fwd, _mha_bwd)
