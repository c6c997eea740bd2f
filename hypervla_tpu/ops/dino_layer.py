"""Pallas streaming kernel for the DINOv2 trunk at serving time (bs=1).

The bs=1 closed-loop step is bound by streaming the trunk's ~170 MB of
bf16 weights from HBM: XLA's op-per-op schedule reaches only ~320 GB/s
effective (0.53 ms device, round-3 profile via scripts/profile_serving —
half of it VPU LayerNorm reduce fusions that serialize against the weight
prefetches). This kernel runs all 12 transformer layers as ONE
pallas_call whose grid streams the stacked weights in (hidden, 4*hidden)
chunks:

  grid = (12 layers, 3 stages); stage s DMAs one weight chunk while stage
  s-1 computes (Mosaic double-buffers grid-indexed blocks automatically):

    s0: LN1(x) -> n ; qkv = n@[Wq|Wk|Wv] ; 12-head attention ;
        x += ls1 * (attn@Wo + bo)                  chunk [Wq|Wk|Wv|Wo]
    s1: LN2(x) -> n ; h = gelu(n@W1 + b1)          chunk W1
    s2: x += ls2 * (h@W2 + b2)                     chunk W2^T

Attention never slices at 64-lane offsets: heads live two-per-128-lane
slab and are separated with LANE MASKS (`dot(q*mask_h, k)` contracts the
full slab; the zeros kill the cross-head terms and the MXU is 128 wide
either way) — the same trick as the training kernel
(ops/fused_attention.py), so no cross-lane shuffles or head concatenates
ever materialize.

The [257, 768] residual stream and the MLP activation stay resident in
VMEM scratch for the whole 36-step grid; nothing but the weight chunks
moves, so the floor is the one-pass weight read (~14.2 MB/layer).
Numerics follow the XLA bf16 trunk: LN stats and softmax in fp32,
activations/residuals bf16, exact GELU evaluated in fp32 (polynomial erf
— Mosaic lowers no erf/erfc primitive; <=2e-6 abs from the erfc path, see
ops/gelu.py), fc2 contracted in one fp32-accumulated dot and rounded
once.

Forward-only (no VJP): serving path. Training keeps the differentiable
XLA trunk. Reference surface: the per-step control loop at
/root/reference/data/utils/hypervla_interface.py:164-205 running
hypervla/model.py's frozen DINOv2-base (consumed there via HuggingFace).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HEAD_DIM = 64  # all non-SwiGLU DINOv2 variants (small/base/large)
_STAGES = 3
_LANES = 128  # Mosaic lane width: attention runs on 128-lane head slabs

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


def _lane_mask(h: int):
    """bf16 (1, _LANES) 0/1 mask selecting head h's 64 lanes in the slab."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    return (
        (lane >= h * _HEAD_DIM) & (lane < (h + 1) * _HEAD_DIM)
    ).astype(jnp.bfloat16)


def _kernel(x0_ref, w_ref, b_ref, p_ref, out_ref, x_s, h_s,
            *, eps: float, hidden: int):
    mlp = 4 * hidden
    i = pl.program_id(0)
    s = pl.program_id(1)
    w = w_ref[0, 0]          # (hidden, 4*hidden) bf16
    # all 3 stage biases ride in one (1, 3, 4*hidden) block per layer; the
    # stage's row is picked dynamically here — 48 KB, noise vs the 14 MB
    # of weights
    bias = b_ref[0, s]       # (4*hidden,) fp32

    @pl.when((i == 0) & (s == 0))
    def _init():
        x_s[...] = x0_ref[...]

    @pl.when(s == 0)
    def _attn():
        n = _ln_f32(x_s[...], p_ref[0, _LN1_S], p_ref[0, _LN1_B], eps)
        # the XLA path's bf16 Dense rounds the fp32 dot to bf16, then adds
        # the bf16-cast bias; reproduce exactly
        qkv = jax.lax.dot_general(
            n, w[:, 0:3 * hidden], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias[0:3 * hidden].astype(jnp.bfloat16)
        # 1/sqrt(head_dim) = 0.125: exact in bf16, applied to q as in the
        # XLA path (models/encoders/dinov2.py::_SelfAttention)
        q = qkv[:, 0:hidden] * jnp.bfloat16(0.125)
        heads_per_slab = _LANES // _HEAD_DIM
        ao = None
        for j in range(hidden // _LANES):
            lo, hi = j * _LANES, (j + 1) * _LANES
            qs = q[:, lo:hi]
            ks = qkv[:, hidden + lo:hidden + hi]
            vs = qkv[:, 2 * hidden + lo:2 * hidden + hi]
            oslab = None
            for h in range(heads_per_slab):
                mask = _lane_mask(h)
                # bf16 score rounding before the fp32 softmax, matching
                # the XLA path's bf16 einsum
                scores = jax.lax.dot_general(
                    qs * mask, ks, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16).astype(jnp.float32)  # (S, S)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                probs = (
                    e / jnp.sum(e, axis=-1, keepdims=True)
                ).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    probs, vs * mask, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # head h's lanes; zeros elsewhere
                oslab = part if oslab is None else oslab + part
            ao = oslab if ao is None else jnp.concatenate([ao, oslab], 1)
        attn_out = jax.lax.dot_general(
            ao, w[:, 3 * hidden:mlp], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias[3 * hidden:mlp].astype(jnp.bfloat16)
        ls1 = p_ref[0, _LS1].astype(jnp.bfloat16)
        x_s[...] = x_s[...] + ls1 * attn_out

    @pl.when(s == 1)
    def _fc1():
        n = _ln_f32(x_s[...], p_ref[0, _LN2_S], p_ref[0, _LN2_B], eps)
        hc = jax.lax.dot_general(
            n, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        h_s[...] = _gelu_exact_f32(hc)

    # w holds the W2^T chunk (hidden out, 4*hidden in): contract the h
    # columns against dim 1 so the fp32 accumulator rounds once, like
    # XLA's single [257,3072]x[3072,768] dot
    @pl.when(s == 2)
    def _fc2():
        y2 = jax.lax.dot_general(
            h_s[...], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias[0:hidden].astype(jnp.bfloat16)
        ls2 = p_ref[0, _LS2].astype(jnp.bfloat16)
        x_s[...] = x_s[...] + ls2 * y2

    @pl.when((i == pl.num_programs(0) - 1) & (s == _STAGES - 1))
    def _emit():
        out_ref[...] = x_s[...]


def dino_layers_serving(x, w, b, p, eps: float = 1e-6,
                        interpret: bool = False):
    """Runs the stacked DINOv2 layers over x.

    x: (seq, 768) bf16 — the embedded tokens (batch squeezed outside).
    w: (L, 3, 768, 3072) bf16 — stacked weight chunks (see stack_* below).
    b: (L, 3, 3072) fp32 — per-stage bias vectors.
    p: (L, 6, 768) fp32 — LN scales/biases and layer scales.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    seq, hidden = x.shape
    layers = w.shape[0]
    mlp = 4 * hidden
    assert hidden % _LANES == 0, hidden
    assert w.shape[1:] == (_STAGES, hidden, mlp), w.shape
    assert b.shape == (layers, _STAGES, mlp)
    assert p.shape == (layers, 6, hidden)
    x = x.astype(jnp.bfloat16)

    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, hidden=hidden),
        grid=(layers, _STAGES),
        in_specs=[
            pl.BlockSpec((seq, hidden), lambda i, s: (0, 0)),
            pl.BlockSpec((1, 1, hidden, mlp), lambda i, s: (i, s, 0, 0)),
            pl.BlockSpec((1, _STAGES, mlp), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, 6, hidden), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((seq, hidden), lambda i, s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((seq, hidden), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((seq, hidden), jnp.bfloat16),      # x (residual)
            pltpu.VMEM((seq, mlp), jnp.bfloat16),         # MLP hidden
        ],
        # the kernel's raison d'etre is VMEM residency: double-buffered
        # 4.7 MB weight chunks + scratch + the union of the stage bodies'
        # temporaries exceed the 16 MB default scoped limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w, b, p)


def dino_layers_serving_scan(x, w, b, p, eps: float = 1e-6):
    """XLA `lax.scan` over the SAME stacked (w, b, p) arrays the Pallas
    kernel streams: one fused layer body compiled once, weights as scan
    xs. Matches the kernel's roundings (bf16 dots with fp32 accumulate,
    fp32 LN/softmax, exact GELU) so the two trunks agree to bf16 noise.

    Why it exists: the Pallas program's FIRST execution through the
    tunneled/shared-chip backend was measured at 583 s in a solo process
    (server-side Mosaic program load; round-5 diagnosis of the r3/r4
    bench-budget blowouts) while an XLA-only program loads in
    milliseconds. This trunk keeps the kernel's tiny dispatch surface —
    3 stacked arrays instead of ~170 per-layer leaves — without any
    custom call, so a cold process reaches full rate immediately.

    x: (seq, hidden) bf16; w/b/p as in dino_layers_serving.
    """
    x = x.astype(jnp.bfloat16)

    def layer(x, wbp):
        return _serving_layer_body(x, wbp, eps), None

    x, _ = jax.lax.scan(layer, x, (w, b, p))
    return x


def dino_layers_serving_unroll(x, w, b, p, eps: float = 1e-6):
    """Statically-UNROLLED twin of dino_layers_serving_scan: a Python loop
    over the same stacked (w, b, p) arrays with CONSTANT layer indices.

    Why it exists: profiling the scan trunk at op level (round 5) showed
    its device time dominated by a per-layer `dynamic-slice` fusion that
    materializes the layer's 14.2 MB MLP weight slab as an explicit copy
    pass (19.6 us/layer — the HBM-floor read time) SERIAL with the layer's
    compute (~25 us): the scan carry structure prevents XLA from fusing
    the weight fetch into the consuming matmuls. With constant indices the
    slices are static, fuse into the dots, and the weight read overlaps
    the MXU — same math, same 4-handle dispatch surface, bigger program
    (12x the layer body, slower compile/server-load).
    """
    x = x.astype(jnp.bfloat16)
    for i in range(w.shape[0]):
        x = _serving_layer_body(x, (w[i], b[i], p[i]), eps)
    return x


def _serving_layer_body(x, wbp, eps):
    """One DINO layer, the serving trunks' shared body (bf16 dots with
    fp32 accumulate, fp32 LN/softmax, exact GELU — the Pallas kernel's
    roundings). x: (seq, hidden) bf16; (wl, bl, pl_) one layer's slabs."""
    seq, hidden = x.shape
    mlp = 4 * hidden
    heads = hidden // _HEAD_DIM
    wl, bl, pl_ = wbp
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    n = _ln_f32(x, pl_[_LN1_S], pl_[_LN1_B], eps)
    qkv = dot(
        n, wl[0, :, 0:3 * hidden], (((1,), (0,)), ((), ()))
    ).astype(jnp.bfloat16) + bl[0, 0:3 * hidden].astype(jnp.bfloat16)
    q = qkv[:, 0:hidden] * jnp.bfloat16(0.125)
    qh = q.reshape(seq, heads, _HEAD_DIM)
    kh = qkv[:, hidden:2 * hidden].reshape(seq, heads, _HEAD_DIM)
    vh = qkv[:, 2 * hidden:3 * hidden].reshape(seq, heads, _HEAD_DIM)
    scores = jnp.einsum(
        "shd,thd->hst", qh, kh, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    ao = jnp.einsum(
        "hst,thd->shd", probs, vh, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16).reshape(seq, hidden)
    attn_out = dot(
        ao, wl[0, :, 3 * hidden:mlp], (((1,), (0,)), ((), ()))
    ).astype(jnp.bfloat16) + bl[0, 3 * hidden:mlp].astype(jnp.bfloat16)
    x = x + pl_[_LS1].astype(jnp.bfloat16) * attn_out

    n2 = _ln_f32(x, pl_[_LN2_S], pl_[_LN2_B], eps)
    hc = dot(
        n2, wl[1], (((1,), (0,)), ((), ()))
    ).astype(jnp.bfloat16) + bl[1].astype(jnp.bfloat16)
    h = _gelu_exact_f32(hc)
    # wl[2] is W2^T (hidden, mlp): contract h's mlp dim against dim 1,
    # fp32 accumulate, one bf16 rounding — same as the kernel's fc2
    y2 = dot(
        h, wl[2], (((1,), (1,)), ((), ()))
    ).astype(jnp.bfloat16) + bl[2, 0:hidden].astype(jnp.bfloat16)
    x = x + pl_[_LS2].astype(jnp.bfloat16) * y2
    return x


@functools.partial(jax.jit, static_argnames=("layerscale_value",))
def _stack_serving_layer_params(layer_params, layerscale_value):
    """On-device body of stack_serving_layer_params: ONE compiled program.

    The previous numpy implementation fetched every per-layer leaf to the
    host (~190 device->host transfers) and re-uploaded three big stacks —
    each transfer a separate RPC on a tunneled/shared chip, measured 27-260 s
    of episode-setup wall clock under contention (round-4 cold-start
    diagnosis). Stacking inside one jit is one dispatch."""
    ws, bs, ps = [], [], []
    num_layers = len(layer_params)
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    for i in range(num_layers):
        lp = layer_params[str(i)]
        att = lp["attention"]["attention"]
        out = lp["attention"]["output"]["dense"]
        fc1 = lp["mlp"]["fc1"]
        fc2 = lp["mlp"]["fc2"]
        hidden = lp["norm1"]["scale"].shape[0]
        mlp = 4 * hidden
        # stage 0 chunk [Wq|Wk|Wv|Wo]; stage 1 W1; stage 2 W2^T — fc2
        # transposed so the chunk stays (hidden, mlp)-shaped
        w0 = jnp.concatenate(
            [f32(att["query"]["kernel"]), f32(att["key"]["kernel"]),
             f32(att["value"]["kernel"]), f32(out["kernel"])], axis=1
        )
        ws.append(jnp.stack([w0, f32(fc1["kernel"]), f32(fc2["kernel"]).T]))
        b0 = jnp.concatenate(
            [f32(att["query"]["bias"]), f32(att["key"]["bias"]),
             f32(att["value"]["bias"]), f32(out["bias"])]
        )
        pad = jnp.zeros((mlp - hidden,), jnp.float32)
        bs.append(jnp.stack([
            b0,
            f32(fc1["bias"]),
            jnp.concatenate([f32(fc2["bias"]), pad]),
        ]))
        ps.append(jnp.stack([
            f32(lp["norm1"]["scale"]), f32(lp["norm1"]["bias"]),
            f32(lp["norm2"]["scale"]), f32(lp["norm2"]["bias"]),
            layerscale_value * f32(lp["layer_scale1"]["lambda1"]),
            layerscale_value * f32(lp["layer_scale2"]["lambda1"]),
        ]))
    return (
        jnp.stack(ws).astype(jnp.bfloat16),
        jnp.stack(bs),
        jnp.stack(ps),
    )


def stack_serving_layer_params(layer_params, layerscale_value: float = 1.0):
    """Builds the kernel's (w, b, p) stacks from the standard per-layer
    param tree (encoder/layer/{i}/... as produced by DINOv2Model /
    converted from HF checkpoints). Run once per episode off the hot path
    (ops/serving.py::make_pallas_trunk_net). p rows follow
    (_LN1_S, _LN1_B, _LN2_S, _LN2_B, _LS1, _LS2)."""
    return _stack_serving_layer_params(
        layer_params, layerscale_value=float(layerscale_value)
    )
