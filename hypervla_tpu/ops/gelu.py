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

# Mosaic (Pallas TPU) does not lower the erf/erfc primitives, so inside
# kernels erf is evaluated with the same Eigen-style odd/even rational
# polynomial XLA itself uses for f32 erf (generic_fast_erf_float): measured
# on this backend it matches jax.lax.erf to <=1 fp32 ulp (6e-7 abs), and the
# resulting bf16 GELU differs from the lax.erfc formulation only in the
# |gelu(x)| < 1e-2 tail, by <=2e-6 absolute (tests/test_gelu_fused.py pins
# this envelope).
_ERF_NUM = (  # odd numerator monomials, highest degree first
    -2.72614225801306e-10, 2.77068142495902e-08, -2.10102402082508e-06,
    -5.69250639462346e-05, -7.34990630326855e-04, -2.95459980854025e-03,
    -1.60960333262415e-02,
)
_ERF_DEN = (  # even denominator monomials, highest degree first
    -1.45660718464996e-05, -2.13374055278905e-04, -1.68282697438203e-03,
    -7.37332916720468e-03, -1.42647390514189e-02,
)


def erf_poly_f32(x):
    """f32 erf via XLA's own rational approximation (kernel-safe)."""
    xc = jnp.clip(x, -4.0, 4.0)
    x2 = xc * xc
    p = jnp.float32(_ERF_NUM[0])
    for c in _ERF_NUM[1:]:
        p = x2 * p + jnp.float32(c)
    p = xc * p
    q = jnp.float32(_ERF_DEN[0])
    for c in _ERF_DEN[1:]:
        q = x2 * q + jnp.float32(c)
    return p / q


def gelu_exact_poly_f32(xf):
    """Exact-GELU forward on an fp32 tensor, erf via erf_poly_f32.

    0.5*x*erfc(-x/sqrt(2)) == x * 0.5*(1 + erf(x/sqrt(2))); caller rounds
    once to the storage dtype.
    """
    cdf = 0.5 * (1.0 + erf_poly_f32(xf * np.float32(math.sqrt(0.5))))
    return xf * cdf


def _gelu_kernel(x_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    o_ref[...] = gelu_exact_poly_f32(xf).astype(o_ref.dtype)


def gelu_exact_fused(x: jax.Array, block_rows: int = 512,
                     interpret: bool = False) -> jax.Array:
    """Elementwise exact GELU over any shape; fp32 internal, one rounding.

    No explicit padding: a ragged final block is fine for an elementwise
    op (Pallas masks the out-of-range rows). The first version padded to
    the block size with jnp.pad + out[:rows] — at the bs=64 training
    shape [16448, 3072] that was TWO extra 101 MB HBM copies per call,
    and its 128-row blocks made 129 grid steps whose per-step overhead
    held the kernel to ~216 GB/s (round-3 profile: 0.935 ms/call vs the
    ~0.3 ms stream floor). 512-row blocks are the largest that fit the
    16 MB scoped-VMEM limit double-buffered (in+out)."""
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() == "cpu"
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = int(np.prod(orig_shape[:-1]))
    block_rows = min(block_rows, rows)
    out = pl.pallas_call(
        _gelu_kernel,
        grid=((rows + block_rows - 1) // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, d), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        # in/out double buffers + the fp32 upcast exceed the default 16 MB
        # scoped budget at 512-row blocks; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x.reshape(rows, d))
    return out.reshape(orig_shape)
