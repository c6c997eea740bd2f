"""Fused residual-add + LayerNorm for the bf16 training trunk (custom VJP).

Round-3 finding (PERF.md "lever bisection"): a standalone Pallas LayerNorm
loses on-chip even when its own device time wins, because XLA's LN stat
fusions share their HBM passes with the neighboring residual add — cutting
the LN out of the schedule forces that add to materialize separately. The
fix is to replace the whole add->LN subgraph, the same structural move that
made the fused attention kernel win.

The bs=64 flagship profile puts the LN stat fusions at ~28.5 ms of the
145 ms step (24 fusions, each a VPU cross-lane reduce running at ~51 GB/s
effective) plus ~10 ms of LN backward dscale/dbias column reduces. This
kernel runs every transformer-layer residual boundary as ONE VMEM pass:

    x_new = x + delta              (the residual add, bf16 rounding)
    y     = LN(x_new) * scale + bias   (fp32 stats on the MXU, bf16 out)

Forward reads x/delta once and writes x_new/y once; statistics are hi/lo
bf16 MXU ones-dots (ops/layer_norm.py machinery, exact to ~2^-16).
Backward consumes BOTH cotangents (x_new feeds the residual stream, y feeds
the sublayer) and exploits d(x_new)/dx = d(x_new)/d(delta) = 1: the single
output buffer serves as dx AND ddelta, and dscale/dbias accumulate
in-kernel across row blocks.

Numerics mirror the XLA path at bf16-training level: the add rounds once to
bf16 (as the einsum path's `attn + hidden_states` does), stats/normalize in
fp32 (flax fast-variance semantics), one rounding of y to bf16. Enable with
vit_kwargs.dino_fused_add_ln; the fp32 default path is untouched so
reference-parity goldens stay at 1e-5.

On-chip verdict (PERF.md "lever bisection" coda): measured 154.4 vs
152.0 ms at bs=64 on top of the full fast preset, baseline re-run after to
rule out drift — the structural replacement loses ~1.7% because the LN
block is only ~15-20 ms of the step post-fused-attention and 24 opaque
custom-calls cost more prefetch overlap than one HBM pass saves. Stays
OPT-IN, not part of apply_fast_training_preset.

Reference surface: the residual adds at
/root/reference — HF FlaxDinov2Layer equivalent (modeling_flax_dinov2)
wrapped by hypervla/components/base_vit.py:76-118.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypervla_tpu.ops.layer_norm import (
    _colsum_tile,
    _ln_stats_tile,
    _rowsum_tile,
)


def _fwd_kernel(x_ref, d_ref, scale_ref, bias_ref, xn_ref, y_ref,
                *, eps: float):
    xn = x_ref[...] + d_ref[...]                   # bf16 add, one rounding
    xn_ref[...] = xn
    xf = xn.astype(jnp.float32)
    dim = xf.shape[-1]
    mean, inv = _ln_stats_tile(xf, dim, eps)
    y = (xf - mean) * inv * scale_ref[...].astype(jnp.float32) + bias_ref[
        ...
    ].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(gy_ref, gxn_ref, xn_ref, scale_ref, dxn_ref, dsb_ref, acc,
                *, eps: float, rows: int):
    i = pl.program_id(0)
    br, dim = gy_ref.shape
    gf = gy_ref[...].astype(jnp.float32)
    xf = xn_ref[...].astype(jnp.float32)
    mean, inv = _ln_stats_tile(xf, dim, eps)
    xhat = (xf - mean) * inv
    # rows past the true length hold block-padding garbage; mask the
    # PRODUCTS (0 * inf = nan would poison the accumulator)
    live = (
        jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0) + i * br < rows
    )
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
    s1 = _rowsum_tile(gs, dim) / dim
    s2 = _rowsum_tile(gs * xhat, dim) / dim
    dxn = inv * (gs - s1 - xhat * s2)
    # the residual-stream cotangent rides through the add unchanged
    dxn_ref[...] = (dxn + gxn_ref[...].astype(jnp.float32)).astype(
        dxn_ref.dtype
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dsb_ref[...] = acc[...]


def _rows_blocks(shape, block_rows):
    rows = int(np.prod(shape[:-1]))
    br = min(block_rows, max(8, rows))
    return rows, br, (rows + br - 1) // br


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_add_ln(x, delta, scale, bias, eps=1e-6, block_rows: int = 1024):
    """(x + delta, LayerNorm(x + delta) * scale + bias) in one HBM pass.

    x, delta: (..., d) same shape/dtype (the residual stream and the
    sublayer output, typically bf16); scale, bias: (d,) LN params.
    Returns (x_new, y). Differentiable; dx == ddelta shares one buffer.
    """
    (xn, y), _ = _fused_add_ln_fwd(x, delta, scale, bias, eps, block_rows)
    return xn, y


def _fused_add_ln_fwd(x, delta, scale, bias, eps, block_rows):
    interpret = jax.default_backend() == "cpu"
    shape = x.shape
    d = shape[-1]
    rows, br, grid = _rows_blocks(shape, block_rows)
    sl = pl.BlockSpec((br, d), lambda i: (i, 0))
    xn, y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            sl, sl,
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=[sl, sl],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((rows, d), x.dtype),
        ],
        interpret=interpret,
    )(x.reshape(rows, d), delta.reshape(rows, d), scale, bias)
    xn = xn.reshape(shape)
    return (xn, y.reshape(shape)), (xn, scale)


def _fused_add_ln_bwd(eps, block_rows, res, g):
    xn, scale = res
    gxn, gy = g
    shape = xn.shape
    d = shape[-1]
    rows, br, grid = _rows_blocks(shape, block_rows)
    interpret = jax.default_backend() == "cpu"
    sl = pl.BlockSpec((br, d), lambda i: (i, 0))
    dxn, dsb = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, rows=rows),
        grid=(grid,),
        in_specs=[
            sl, sl, sl,
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=[
            sl,
            pl.BlockSpec((16, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), xn.dtype),
            jax.ShapeDtypeStruct((16, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((16, d), jnp.float32)],
        interpret=interpret,
    )(
        gy.reshape(rows, d),
        gxn.reshape(rows, d),
        xn.reshape(rows, d),
        scale,
    )
    dxn = dxn.reshape(shape)
    # d(x_new)/dx = d(x_new)/d(delta) = identity: one buffer, two cotangents
    return (
        dxn,
        dxn,
        dsb[0].astype(scale.dtype),
        dsb[8].astype(scale.dtype),
    )


fused_add_ln.defvjp(_fused_add_ln_fwd, _fused_add_ln_bwd)


# ---------------------------------------------------------------------------
# LayerScale-absorbing variant. Measured motivation (bs=64 profile of the
# plain fused_add_ln step): pulling the add out of XLA's schedule left the
# LayerScale multiplies with nowhere to fuse — 7.9 ms of standalone
# broadcast_multiply fusions appeared and ate the LN win. The residual
# boundary in the trunk is x + ls*delta, so the kernel must own all of it.
# ---------------------------------------------------------------------------


def _fwd_scale_kernel(x_ref, d_ref, ls_ref, scale_ref, bias_ref,
                      xn_ref, y_ref, *, eps: float):
    ls = ls_ref[...].astype(x_ref.dtype)           # same cast as _LayerScale
    xn = x_ref[...] + ls * d_ref[...]              # bf16 mul + add roundings
    xn_ref[...] = xn
    xf = xn.astype(jnp.float32)
    dim = xf.shape[-1]
    mean, inv = _ln_stats_tile(xf, dim, eps)
    y = (xf - mean) * inv * scale_ref[...].astype(jnp.float32) + bias_ref[
        ...
    ].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_scale_kernel(gy_ref, gxn_ref, xn_ref, d_ref, ls_ref, scale_ref,
                      dxn_ref, dd_ref, dacc_ref, acc,
                      *, eps: float, rows: int):
    i = pl.program_id(0)
    br, dim = gy_ref.shape
    gf = gy_ref[...].astype(jnp.float32)
    xf = xn_ref[...].astype(jnp.float32)
    mean, inv = _ln_stats_tile(xf, dim, eps)
    xhat = (xf - mean) * inv
    live = (
        jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0) + i * br < rows
    )
    gm = jnp.where(live, gf, 0.0)
    gxm = jnp.where(live, gf * xhat, 0.0)

    gs = gf * scale_ref[...].astype(jnp.float32)
    s1 = _rowsum_tile(gs, dim) / dim
    s2 = _rowsum_tile(gs * xhat, dim) / dim
    dxn = inv * (gs - s1 - xhat * s2) + gxn_ref[...].astype(jnp.float32)
    dxn_ref[...] = dxn.astype(dxn_ref.dtype)
    df = d_ref[...].astype(jnp.float32)
    dd_ref[...] = (dxn * ls_ref[...].astype(jnp.float32)).astype(
        dd_ref.dtype
    )
    dls_part = jnp.where(live, dxn * df, 0.0)
    part = jnp.concatenate(
        [_colsum_tile(gxm, br), _colsum_tile(gm, br),
         _colsum_tile(dls_part, br)],
        axis=0,
    )

    @pl.when(i == 0)
    def _init():
        acc[...] = part

    @pl.when(i > 0)
    def _accum():
        acc[...] = acc[...] + part

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dacc_ref[...] = acc[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_add_scale_ln(x, delta, ls, scale, bias, eps=1e-6,
                       block_rows: int = 1024):
    """(x + ls*delta, LayerNorm(x + ls*delta) * scale + bias), one pass.

    The full transformer residual boundary — LayerScale multiply, residual
    add, and the LayerNorm that consumes the new stream — as one kernel.
    x, delta: (..., d) bf16; ls: (d,) fp32 (the LayerScale vector,
    layerscale_value * lambda1); scale, bias: (d,) LN params.
    Returns (x_new, y). Differentiable in all five tensor inputs.
    """
    (xn, y), _ = _fused_add_scale_ln_fwd(
        x, delta, ls, scale, bias, eps, block_rows
    )
    return xn, y


def _fused_add_scale_ln_fwd(x, delta, ls, scale, bias, eps, block_rows):
    interpret = jax.default_backend() == "cpu"
    shape = x.shape
    d = shape[-1]
    rows, br, grid = _rows_blocks(shape, block_rows)
    sl = pl.BlockSpec((br, d), lambda i: (i, 0))
    vec = pl.BlockSpec((d,), lambda i: (0,))
    xn, y = pl.pallas_call(
        functools.partial(_fwd_scale_kernel, eps=eps),
        grid=(grid,),
        in_specs=[sl, sl, vec, vec, vec],
        out_specs=[sl, sl],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((rows, d), x.dtype),
        ],
        interpret=interpret,
    )(x.reshape(rows, d), delta.reshape(rows, d), ls, scale, bias)
    xn = xn.reshape(shape)
    return (xn, y.reshape(shape)), (xn, delta, ls, scale)


def _fused_add_scale_ln_bwd(eps, block_rows, res, g):
    xn, delta, ls, scale = res
    gxn, gy = g
    shape = xn.shape
    d = shape[-1]
    rows, br, grid = _rows_blocks(shape, block_rows)
    interpret = jax.default_backend() == "cpu"
    sl = pl.BlockSpec((br, d), lambda i: (i, 0))
    vec = pl.BlockSpec((d,), lambda i: (0,))
    dxn, dd, dacc = pl.pallas_call(
        functools.partial(_bwd_scale_kernel, eps=eps, rows=rows),
        grid=(grid,),
        in_specs=[sl, sl, sl, sl, vec, vec],
        out_specs=[
            sl, sl,
            pl.BlockSpec((24, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), xn.dtype),
            jax.ShapeDtypeStruct((rows, d), xn.dtype),
            jax.ShapeDtypeStruct((24, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((24, d), jnp.float32)],
        interpret=interpret,
    )(
        gy.reshape(rows, d),
        gxn.reshape(rows, d),
        xn.reshape(rows, d),
        delta.reshape(rows, d),
        ls,
        scale,
    )
    return (
        dxn.reshape(shape),
        dd.reshape(shape),
        dacc[16].astype(ls.dtype),
        dacc[0].astype(scale.dtype),
        dacc[8].astype(scale.dtype),
    )


fused_add_scale_ln.defvjp(_fused_add_scale_ln_fwd, _fused_add_scale_ln_bwd)
