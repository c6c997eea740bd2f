"""Pallas fused exact-GELU forward (TPU).

XLA splits the bf16 trunk's fc1 -> exact-GELU chain into two fusions with
a materialized fp32 [B,257,3072] intermediate between them (202 MB at
bs=64 — written by the bias-add fusion, re-read by the erfc fusion;
~1.5 ms/layer of the round-3 bs=64 profile). This kernel forces the whole
thing into one VMEM pass: read the bf16 pre-activation block, upcast to
fp32 in registers, evaluate 0.5*x*erfc(-x/sqrt(2)), round once, write
bf16. Same math as models/encoders/dinov2.py::_gelu_exact's forward; the
custom VJP there keeps the bf16 pre-activation as the backward residual
either way.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _gelu_kernel(x_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    o_ref[...] = (
        0.5 * xf * jax.lax.erfc(-xf * math.sqrt(0.5))
    ).astype(o_ref.dtype)


def gelu_exact_fused(x: jax.Array, block_rows: int = 512,
                     interpret: bool = False) -> jax.Array:
    """Elementwise exact GELU over any shape; fp32 internal, one rounding."""
    interpret = interpret or jax.default_backend() == "cpu"
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = int(np.prod(orig_shape[:-1]))
    block_rows = min(block_rows, rows)
    xr = x.reshape(rows, d)
    rows_pad = (rows + block_rows - 1) // block_rows * block_rows
    if rows_pad != rows:
        xr = jnp.pad(xr, ((0, rows_pad - rows), (0, 0)))
    out = pl.pallas_call(
        _gelu_kernel,
        grid=(rows_pad // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, d), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), x.dtype),
        interpret=interpret,
    )(xr)
    return out[:rows].reshape(orig_shape)
