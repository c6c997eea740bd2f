"""Pallas streaming kernel for the DINOv2 trunk at serving time (bs=1).

The bs=1 closed-loop step is bound by streaming the trunk's ~170 MB of
bf16 weights from HBM: XLA's op-per-op schedule reaches only ~320 GB/s
effective (0.53 ms device, round-3 profile via scripts/profile_serving —
half of it VPU LayerNorm reduce fusions that serialize against the weight
prefetches). This kernel runs all 12 transformer layers as ONE
pallas_call whose grid streams the stacked weights in (768, 1536) chunks:

  grid = (12 layers, 6 stages); stage s DMAs one weight chunk while stage
  s-1 computes (Mosaic double-buffers grid-indexed blocks automatically):

    s0: LN1(x) -> n;  q = n@Wq + bq ; k = n@Wk + bk      chunk [Wq|Wk]
    s1: v = n@Wv + bv ; 12-head attention ;
        x += ls1 * (attn@Wo + bo)                         chunk [Wv|Wo]
    s2: LN2(x) -> n ; h[:, :1536] = gelu(n@W1a + b1a)     chunk W1a
    s3: h[:, 1536:] = gelu(n@W1b + b1b)                   chunk W1b
    s4: acc  = h[:, :1536] @ W2a                          chunk W2a^T
    s5: acc += h[:, 1536:] @ W2b ; x += ls2*(acc + b2)    chunk W2b^T

The [257, 768] residual stream, LN outputs, qkv and MLP activations all
stay resident in VMEM scratch for the whole 72-step grid; nothing but the
weight chunks moves, so the floor is the one-pass weight read
(~14.2 MB/layer). Numerics follow the XLA bf16 trunk: LN stats and
softmax in fp32, activations/residuals bf16, exact GELU evaluated in fp32
(polynomial erf — Mosaic lowers no erf/erfc primitive; <=2e-6 abs from the
erfc path, see ops/gelu.py), fc2 accumulated in fp32 across chunks and
rounded once.

Forward-only (no VJP): serving path. Training keeps the differentiable
XLA trunk. Reference surface: the per-step control loop at
/root/reference/data/utils/hypervla_interface.py:164-205 running
hypervla/model.py's frozen DINOv2-base (consumed there via HuggingFace).
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HEAD_DIM = 64  # all non-SwiGLU DINOv2 variants (small/base/large)
_STAGES = 6

# p-array row indices (per-layer fp32 LN/layer-scale parameters)
_LN1_S, _LN1_B, _LN2_S, _LN2_B, _LS1, _LS2 = range(6)


def _ln_f32(x_bf16, scale_f32, bias_f32, eps):
    """flax nn.LayerNorm semantics: fp32 fast-variance stats, fp32
    normalize, round once to bf16."""
    xf = x_bf16.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale_f32 + bias_f32).astype(jnp.bfloat16)


def _gelu_exact_f32(h_bf16):
    """The trunk's exact GELU: fp32 evaluation, one bf16 rounding. erf is
    the polynomial XLA uses for f32 (Mosaic has no erf/erfc primitive);
    matches models/encoders/dinov2.py::_gelu_exact to <=2e-6 absolute —
    see ops/gelu.py."""
    from hypervla_tpu.ops.gelu import gelu_exact_poly_f32

    xf = h_bf16.astype(jnp.float32)
    return gelu_exact_poly_f32(xf).astype(jnp.bfloat16)


def _kernel(x0_ref, w_ref, b_ref, p_ref, out_ref,
            x_s, n_s, qkv_s, h_s, acc_s, *, eps: float, hidden: int,
            heads: int):
    chunk = 2 * hidden
    mlp = 4 * hidden
    i = pl.program_id(0)
    s = pl.program_id(1)
    w = w_ref[0, 0]          # (hidden, 2*hidden) bf16
    # all 6 stage biases ride in one (1, 6, 2*hidden) block per layer
    # (Mosaic requires the -2 block dim be full or 8-divisible); the
    # stage's row is picked dynamically here — 36 KB, noise vs the 14 MB
    # of weights
    bias = b_ref[0, s]       # (2*hidden,) fp32

    @pl.when((i == 0) & (s == 0))
    def _init():
        x_s[...] = x0_ref[...]

    @pl.when(s == 0)
    def _qk():
        n = _ln_f32(x_s[...], p_ref[0, _LN1_S], p_ref[0, _LN1_B], eps)
        n_s[...] = n
        qk = jax.lax.dot_general(
            n, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        qkv_s[:, 0:chunk] = qk

    @pl.when(s == 1)
    def _attn():
        n = n_s[...]
        v = jax.lax.dot_general(
            n, w[:, 0:hidden], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias[0:hidden].astype(jnp.bfloat16)
        qkv = qkv_s[:, 0:chunk]
        # 1/sqrt(head_dim) = 0.125: exact in bf16, applied to q as in the
        # XLA path (models/encoders/dinov2.py::_SelfAttention)
        q = qkv[:, 0:hidden] * jnp.bfloat16(0.125)
        k = qkv[:, hidden:chunk]
        outs = []
        for h in range(heads):
            lo, hi = h * _HEAD_DIM, (h + 1) * _HEAD_DIM
            # the XLA path's bf16 einsum rounds the scores to bf16 before
            # the fp32 softmax; reproduce that rounding for parity
            scores = jax.lax.dot_general(
                q[:, lo:hi], k[:, lo:hi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16).astype(jnp.float32)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                jnp.bfloat16
            )
            outs.append(
                jax.lax.dot_general(
                    probs, v[:, lo:hi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            )
        ao = jnp.concatenate(outs, axis=1)
        attn_out = jax.lax.dot_general(
            ao, w[:, hidden:chunk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias[hidden:chunk].astype(jnp.bfloat16)
        ls1 = p_ref[0, _LS1].astype(jnp.bfloat16)
        x_s[...] = x_s[...] + ls1 * attn_out

    @pl.when((s == 2) | (s == 3))
    def _fc1():
        @pl.when(s == 2)
        def _ln2():
            n_s[...] = _ln_f32(
                x_s[...], p_ref[0, _LN2_S], p_ref[0, _LN2_B], eps
            )

        hc = jax.lax.dot_general(
            n_s[...], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        h = _gelu_exact_f32(hc)

        @pl.when(s == 2)
        def _store_a():
            h_s[:, 0:chunk] = h

        @pl.when(s == 3)
        def _store_b():
            h_s[:, chunk:mlp] = h

    # w holds W2^T chunks (768 out, 1536 in): contract the h columns
    # against dim 1 so the fp32 accumulator rounds once, like XLA's
    # single [257,3072]x[3072,768] dot
    @pl.when(s == 4)
    def _fc2a():
        acc_s[...] = jax.lax.dot_general(
            h_s[:, 0:chunk], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(s == 5)
    def _fc2b():
        part = jax.lax.dot_general(
            h_s[:, chunk:mlp], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y2 = (acc_s[...] + part).astype(jnp.bfloat16) + bias[
            0:hidden
        ].astype(jnp.bfloat16)
        ls2 = p_ref[0, _LS2].astype(jnp.bfloat16)
        x_s[...] = x_s[...] + ls2 * y2

    @pl.when((i == pl.num_programs(0) - 1) & (s == _STAGES - 1))
    def _emit():
        out_ref[...] = x_s[...]


def dino_layers_serving(x, w, b, p, eps: float = 1e-6,
                        interpret: bool = False):
    """Runs the stacked DINOv2 layers over x.

    x: (seq, 768) bf16 — the embedded tokens (batch squeezed outside).
    w: (L, 6, 768, 1536) bf16 — stacked weight chunks (see stack_* below).
    b: (L, 6, 1536) fp32 — per-stage bias vectors.
    p: (L, 6, 768) fp32 — LN scales/biases and layer scales.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    seq, hidden = x.shape
    layers = w.shape[0]
    chunk = 2 * hidden
    heads = hidden // _HEAD_DIM
    assert w.shape[1:] == (_STAGES, hidden, chunk), w.shape
    assert b.shape == (layers, _STAGES, chunk)
    assert p.shape == (layers, _STAGES, hidden)
    x = x.astype(jnp.bfloat16)

    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, hidden=hidden, heads=heads),
        grid=(layers, _STAGES),
        in_specs=[
            pl.BlockSpec((seq, hidden), lambda i, s: (0, 0)),
            pl.BlockSpec((1, 1, hidden, chunk), lambda i, s: (i, s, 0, 0)),
            pl.BlockSpec((1, _STAGES, chunk), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, _STAGES, hidden), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((seq, hidden), lambda i, s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((seq, hidden), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((seq, hidden), jnp.bfloat16),    # x (residual)
            pltpu.VMEM((seq, hidden), jnp.bfloat16),    # LN output
            pltpu.VMEM((seq, chunk), jnp.bfloat16),     # q|k
            pltpu.VMEM((seq, 4 * hidden), jnp.bfloat16),  # MLP hidden
            pltpu.VMEM((seq, hidden), jnp.float32),     # fc2 accumulator
        ],
        # the kernel's raison d'etre is VMEM residency: blocks + scratch +
        # the union of the 6 stage bodies' temporaries exceed the 16 MB
        # default scoped limit (measured 30.8 MB on v5e, which has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w, b, p)


def stack_serving_layer_params(layer_params, layerscale_value: float = 1.0):
    """Builds the kernel's (w, b, p) stacks from the standard per-layer
    param tree (encoder/layer/{i}/... as produced by DINOv2Model /
    converted from HF checkpoints). Run once per episode off the hot path
    (ops/serving.py::prepare_serving_params)."""
    num_layers = len(layer_params)
    hidden = int(
        np.asarray(layer_params["0"]["norm1"]["scale"]).shape[0]
    )
    chunk = 2 * hidden
    w = np.zeros((num_layers, _STAGES, hidden, chunk), np.float32)
    b = np.zeros((num_layers, _STAGES, chunk), np.float32)
    p = np.zeros((num_layers, _STAGES, hidden), np.float32)
    for i in range(num_layers):
        lp = layer_params[str(i)]
        att = lp["attention"]["attention"]
        out = lp["attention"]["output"]["dense"]
        fc1 = lp["mlp"]["fc1"]
        fc2 = lp["mlp"]["fc2"]
        w[i, 0, :, 0:hidden] = att["query"]["kernel"]
        w[i, 0, :, hidden:] = att["key"]["kernel"]
        w[i, 1, :, 0:hidden] = att["value"]["kernel"]
        w[i, 1, :, hidden:] = out["kernel"]
        w[i, 2] = fc1["kernel"][:, 0:chunk]
        w[i, 3] = fc1["kernel"][:, chunk:]
        w2t = np.asarray(fc2["kernel"], np.float32).T  # (hidden, 4*hidden)
        w[i, 4] = w2t[:, 0:chunk]
        w[i, 5] = w2t[:, chunk:]
        b[i, 0, 0:hidden] = att["query"]["bias"]
        b[i, 0, hidden:] = att["key"]["bias"]
        b[i, 1, 0:hidden] = att["value"]["bias"]
        b[i, 1, hidden:] = out["bias"]
        b[i, 2] = fc1["bias"][0:chunk]
        b[i, 3] = fc1["bias"][chunk:]
        b[i, 5, 0:hidden] = fc2["bias"]
        p[i, _LN1_S] = lp["norm1"]["scale"]
        p[i, _LN1_B] = lp["norm1"]["bias"]
        p[i, _LN2_S] = lp["norm2"]["scale"]
        p[i, _LN2_B] = lp["norm2"]["bias"]
        p[i, _LS1] = layerscale_value * np.asarray(
            lp["layer_scale1"]["lambda1"], np.float32
        )
        p[i, _LS2] = layerscale_value * np.asarray(
            lp["layer_scale2"]["lambda1"], np.float32
        )
    return (
        jnp.asarray(w, jnp.bfloat16),
        jnp.asarray(b, jnp.float32),
        jnp.asarray(p, jnp.float32),
    )
