"""Pallas fused LayerNorm (inference path).

XLA lowers LayerNorm as a multi-pass reduction + normalize fusion that runs
well below HBM bandwidth at small batch (profiled ~23us per (257, 768) call
on v5e — ~87 GB/s). This kernel does the whole thing in one VMEM-resident
pass per row block. Forward-only: used on serving paths (no grad); training
keeps XLA's differentiable LayerNorm.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (block_rows, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
    block_rows: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis. x: (..., rows, d)."""
    interpret = interpret or jax.default_backend() == "cpu"
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = int(np.prod(orig_shape[:-1]))
    xr = x.reshape(rows, d)
    rows_pad = (rows + block_rows - 1) // block_rows * block_rows
    if rows_pad != rows:
        xr = jnp.pad(xr, ((0, rows_pad - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), x.dtype),
        interpret=interpret,
    )(xr, scale, bias)
    return out[:rows].reshape(orig_shape)


# ---------------------------------------------------------------------------
# MXU-dot LayerNorm (training-grade, custom VJP)
#
# XLA lowers LayerNorm's lane-dim reductions to VPU cross-lane reduce
# fusions that run at ~27 GB/s on v5e — 28 ms of the 163 ms bs=64 flagship
# train step is LN forward stats alone, with another ~10 ms of f32[768]
# column reduces in the backward (round-3 profile, /tmp/prof_bs64). Every
# reduction here is expressed as a ones-matrix dot instead: the MXU
# computes the same sums at matmul speed. The ones operand is built at
# 128 lanes (matrix x vector dots get canonicalized back into the slow
# reduce) and wrapped in optimization_barrier so the algebraic simplifier
# can neither fold the constant nor sink the column slice into the dot.
# ---------------------------------------------------------------------------


def _row_sums_dot(a):
    """sum over the last axis via an MXU ones-dot -> (..., 1) fp32."""
    d = a.shape[-1]
    ones = jax.lax.optimization_barrier(jnp.ones((d, 128), a.dtype))
    s = jax.lax.dot_general(
        a, ones, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.optimization_barrier(s)[..., :1]


def _col_sums_dot(a):
    """sum over all leading axes via an MXU ones-dot -> (d,) fp32."""
    d = a.shape[-1]
    ar = a.reshape(-1, d)
    n = ar.shape[0]
    ones = jax.lax.optimization_barrier(jnp.ones((n, 128), ar.dtype))
    s = jax.lax.dot_general(
        ar, ones, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.optimization_barrier(s)[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_dot(x, scale, bias, eps=1e-6):
    """LayerNorm over the last axis; flax nn.LayerNorm fast-variance
    semantics (fp32 stats, fp32 normalize, one rounding to x.dtype), with
    all reductions on the MXU. Differentiable: the custom VJP computes the
    standard LN backward with its row/column reductions as ones-dots too,
    keeping only x (in its own dtype) plus the (..., 1) fp32 stats as
    residuals."""
    y, _ = _layer_norm_dot_fwd(x, scale, bias, eps)
    return y


def _ln_dot_stats(x, eps):
    d = x.shape[-1]
    mean = _row_sums_dot(x) / d
    msq = _row_sums_dot(x * x) / d
    var = jnp.maximum(msq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv


def _layer_norm_dot_fwd(x, scale, bias, eps):
    mean, inv = _ln_dot_stats(x, eps)
    xf = x.astype(jnp.float32)
    y = ((xf - mean) * inv * scale.astype(jnp.float32)
         + bias.astype(jnp.float32)).astype(x.dtype)
    return y, (x, mean, inv, scale)


def _layer_norm_dot_bwd(eps, res, g):
    x, mean, inv, scale = res
    d = x.shape[-1]
    gf = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    dscale = _col_sums_dot(gf * xhat)
    dbias = _col_sums_dot(gf)
    gs = gf * scale.astype(jnp.float32)
    s1 = _row_sums_dot(gs) / d
    s2 = _row_sums_dot(gs * xhat) / d
    dx = (inv * (gs - s1 - xhat * s2)).astype(x.dtype)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


layer_norm_dot.defvjp(_layer_norm_dot_fwd, _layer_norm_dot_bwd)


# ---------------------------------------------------------------------------
# Pallas training LayerNorm (custom VJP, MXU-dot statistics IN-KERNEL)
#
# The ones-dot rewrite above (layer_norm_dot) removes the slow VPU
# cross-lane reduces but loses at training batch sizes: the
# optimization_barrier fences force x*x (forward) and g*xhat (backward)
# to materialize to HBM as dot operands instead of fusing into one reduce
# pass — measured bs=64 flagship step 182.8 -> 190.4 ms. This kernel keeps
# the MXU-dot statistics but runs them on VMEM-RESIDENT tiles inside one
# Pallas pass, so HBM sees exactly one read of x and one write of y
# (backward: one read each of g and x, one write of dx; the row statistics
# are recomputed from x rather than stored — two tiny MXU dots beat 17 MB
# of stat traffic). The stat dots are bf16-in/fp32-accumulate MXU
# contractions — bf16->fp32 conversion is exact, so for a bf16 trunk the
# math equals flax's fp32 upcast-then-sum, up to summation order; fp32
# operands keep full precision by splitting into bf16 hi/lo halves summed
# in two full-rate dots (hi exact + residual, error ~2^-16 relative).
# ---------------------------------------------------------------------------


def _rowsum_tile(a_f32, d):
    """fp32 (R, d) -> (R, 1) row sums via two hi/lo bf16 MXU dots."""
    hi = a_f32.astype(jnp.bfloat16)
    lo = (a_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ones = jnp.ones((d, 128), jnp.bfloat16)
    s = jax.lax.dot_general(
        hi, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        lo, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return s[:, 0:1]


def _colsum_tile(a_f32, br):
    """fp32 (R, d) -> (8, d) column sums (rows identical) via hi/lo dots."""
    hi = a_f32.astype(jnp.bfloat16)
    lo = (a_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ones = jnp.ones((8, br), jnp.bfloat16)
    return jax.lax.dot_general(
        ones, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        ones, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ln_stats_tile(xf, d, eps):
    mean = _rowsum_tile(xf, d) / d
    msq = _rowsum_tile(xf * xf, d) / d
    var = jnp.maximum(msq - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _ln_train_fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # (Br, d)
    d = xf.shape[-1]
    mean, inv = _ln_stats_tile(xf, d, eps)
    y = (xf - mean) * inv * scale_ref[...].astype(jnp.float32) + bias_ref[
        ...
    ].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ln_train_bwd_kernel(g_ref, x_ref, scale_ref, dx_ref, dsb_ref, acc,
                         *, eps: float, rows: int):
    i = pl.program_id(0)
    br, d = g_ref.shape
    gf = g_ref[...].astype(jnp.float32)
    xf = x_ref[...].astype(jnp.float32)
    mean, inv = _ln_stats_tile(xf, d, eps)
    xhat = (xf - mean) * inv
    # rows past the true length hold block-padding garbage; they must not
    # leak into the cross-row dscale/dbias accumulation
    live = (
        jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0) + i * br < rows
    )
    # mask the PRODUCTS, not just g: padded rows can hold non-finite xhat
    # and 0 * inf = nan would poison the accumulator
    gm = jnp.where(live, gf, 0.0)
    gxm = jnp.where(live, gf * xhat, 0.0)
    part = jnp.concatenate(
        [_colsum_tile(gxm, br), _colsum_tile(gm, br)], axis=0
    )

    @pl.when(i == 0)
    def _init():
        acc[...] = part

    @pl.when(i > 0)
    def _accum():
        acc[...] = acc[...] + part

    gs = gf * scale_ref[...].astype(jnp.float32)
    s1 = _rowsum_tile(gs, d) / d
    s2 = _rowsum_tile(gs * xhat, d) / d
    dx_ref[...] = (inv * (gs - s1 - xhat * s2)).astype(dx_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dsb_ref[...] = acc[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_pallas(x, scale, bias, eps=1e-6, block_rows: int = 1024):
    """Differentiable single-HBM-pass LayerNorm over the last axis.

    flax nn.LayerNorm fast-variance semantics (fp32 statistics on the
    uncast input, fp32 normalize, one rounding to x.dtype). Shapes:
    x (..., d); scale/bias (d,). Training-geometry counterpart of
    layer_norm() above — use via fused_layer_norm="pallas_train".
    """
    y, _ = _layer_norm_pallas_fwd(x, scale, bias, eps, block_rows)
    return y


def _ln_rows_blocks(shape, block_rows):
    rows = int(np.prod(shape[:-1]))
    br = min(block_rows, max(8, rows))
    return rows, br, (rows + br - 1) // br


def _layer_norm_pallas_fwd(x, scale, bias, eps, block_rows):
    interpret = jax.default_backend() == "cpu"
    shape = x.shape
    d = shape[-1]
    rows, br, grid = _ln_rows_blocks(shape, block_rows)
    y = pl.pallas_call(
        functools.partial(_ln_train_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x.reshape(rows, d), scale, bias)
    return y.reshape(shape), (x, scale)


def _layer_norm_pallas_bwd(eps, block_rows, res, g):
    from jax.experimental.pallas import tpu as pltpu

    x, scale = res
    shape = x.shape
    d = shape[-1]
    rows, br, grid = _ln_rows_blocks(shape, block_rows)
    interpret = jax.default_backend() == "cpu"
    dx, dsb = pl.pallas_call(
        functools.partial(_ln_train_bwd_kernel, eps=eps, rows=rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((16, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((16, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((16, d), jnp.float32)],
        interpret=interpret,
    )(g.reshape(rows, d), x.reshape(rows, d), scale)
    # the (8, d) colsum rows are identical (ones operand): take one row
    return (
        dx.reshape(shape),
        dsb[0].astype(scale.dtype),
        dsb[8].astype(scale.dtype),
    )


layer_norm_pallas.defvjp(_layer_norm_pallas_fwd, _layer_norm_pallas_bwd)


@jax.custom_vjp
def softmax_dot(x):
    """Softmax over the last axis with the SUM reductions on the MXU.

    The attention-probability softmax on [B,12,257,257] logits is another
    VPU cross-lane-reduce hotspot (~18 ms of stats fusions in the bs=64
    round-3 profile, forward + backward). The max still has to be a VPU
    reduce (no dot trick for max), but the exp-sum and the backward's
    sum(g*p) row reduction both become ones-dots. fp32 internals, output
    in x.dtype — matches jax.nn.softmax(x.astype(f32)).astype(x.dtype)
    up to summation order."""
    y, _ = _softmax_dot_fwd(x)
    return y


def _softmax_dot_fwd(x):
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=-1, keepdims=True)
    e = jnp.exp(xf - m)
    denom = _row_sums_dot(e)
    p = (e / denom).astype(x.dtype)
    return p, p


def _softmax_dot_bwd(p, g):
    pf = p.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    dot = _row_sums_dot(gf * pf)
    return ((gf - dot) * pf).astype(p.dtype),


softmax_dot.defvjp(_softmax_dot_fwd, _softmax_dot_bwd)
