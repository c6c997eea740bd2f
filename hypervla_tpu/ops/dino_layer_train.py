"""Batched full-layer Pallas kernel for the TRAINING DINOv2 trunk.

Round-3 closed the per-fusion question (PERF.md "lever bisection"): inside
an XLA-scheduled trunk, carving out ONE fusion (LN, softmax, GELU) always
loses — the fusions share HBM passes with their neighbors and an opaque
custom-call forfeits prefetch overlap. The lever that won (+12%) was
structural: ops/fused_attention.py replaced the whole attention subgraph.
This kernel is the same logic one level up, the round-3 verdict's remaining
structural lever: the ENTIRE transformer layer —

    LN1 -> QKV -> 12-head attention -> out-proj -> LayerScale residual ->
    LN2 -> fc1 -> exact GELU -> fc2 -> LayerScale residual

— as ONE forward and ONE backward custom call per layer (instead of the
fused-attention call plus ~10 XLA LN/GEMM/LayerScale fusions around it).
Nothing between the layer's ops ever returns to XLA, so there is no
prefetch-overlap to forfeit and no LN stat fusion left to schedule.

Geometry/numerics follow the kernels that already won on-chip:
  * heads live two-per-128-lane slab, separated with LANE MASKS (the MXU
    is 128 wide either way) — identical to ops/fused_attention.py, so the
    attention numerics match the current fast-preset path bit-for-bit;
  * LN stats and softmax in fp32, activations/residuals bf16, exact GELU
    via the fp32 polynomial erf (ops/gelu.py; Mosaic lowers no erf);
  * backward saves the SAME residuals the XLA autodiff path keeps (bf16
    probabilities, bf16 pre-GELU) plus the small per-layer streams
    (x1/y1/y2/qkv), and RECOMPUTES what the XLA path stores: n1/n2 (LN
    forward) and h = gelu(hc) — so it reads ~100 MB/layer LESS at bs=64
    (the [B,257,3072] post-GELU tensor XLA keeps as fc2's linearization
    point);
  * weight gradients accumulate across the batch-block grid in fp32 VMEM
    output refs and are written to HBM once.

Works on [B, S, H] batched inputs, so it pairs with
config["hoist_shared_trunk"] (the trunk runs outside the per-sample vmap;
inside the vmap a closed-over weight's cotangent would materialize
per-sample). The frozen conditioning encoder takes the no-residual forward
automatically: jax only calls the residual-saving path under
differentiation.

Reference surface: /root/reference/hypervla/model.py:543-565 (the frozen
HF DINOv2 the reference fine-tunes via torch autograd); here the layer is
a single fwd/bwd custom-call pair shaped for the v5e MXU.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypervla_tpu.ops.gelu import gelu_exact_poly_f32, erf_poly_f32

import os as _os

_LANES = 128
_VMEM_LIMIT = int(
    _os.environ.get("HYPERVLA_LAYER_KERNEL_VMEM_MB", "110")
) * 1024 * 1024

# pv row indices (fp32 per-layer vector parameters, packed (11, H))
(_BQ, _BK, _BV, _BO, _B2,
 _LN1_S, _LN1_B, _LN2_S, _LN2_B, _LS1, _LS2) = range(11)


def _ln_f32(x_bf16, scale_f32, bias_f32, eps):
    """flax nn.LayerNorm semantics: fp32 fast-variance stats, fp32
    normalize+affine, one bf16 rounding. Also returns (mu, rs, xf) for the
    backward pass."""
    xf = x_bf16.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    rs = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rs
    y = (xhat * scale_f32 + bias_f32).astype(jnp.bfloat16)
    return y, xhat, rs


def _ln_bwd_f32(dy_f32, xhat, rs, scale_f32):
    """LayerNorm input gradient (fp32): standard fused formula."""
    dxhat = dy_f32 * scale_f32
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rs * (dxhat - m1 - xhat * m2)


def _gelu_bwd_f32(hc_bf16):
    """d/dx of the exact GELU, evaluated in fp32 from the bf16 residual
    (matches models/encoders/dinov2.py::_gelu_exact_bwd)."""
    xf = hc_bf16.astype(jnp.float32)
    cdf = 0.5 * (1.0 + erf_poly_f32(xf * np.float32(np.sqrt(0.5))))
    pdf = jnp.exp(-0.5 * xf * xf) * np.float32(1.0 / np.sqrt(2 * np.pi))
    return cdf + xf * pdf


def _lane_mask(d: int, h: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    return ((lane >= h * d) & (lane < (h + 1) * d)).astype(jnp.bfloat16)


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def _attention_fwd(q, k, v, i, s, heads, d, scale, p_ref):
    """Lane-mask slab attention for sample i (q/k/v are the (S, H) unscaled
    Dense outputs). Returns ao (S, H) bf16; writes bf16 probabilities into
    p_ref[i, head] when p_ref is not None. Numerics identical to
    ops/fused_attention.py::_fwd_kernel."""
    hidden = q.shape[-1]
    hpb = _LANES // d
    q2 = q * jnp.bfloat16(scale)
    ao = None
    for j in range(hidden // _LANES):
        lo, hi = j * _LANES, (j + 1) * _LANES
        qs, ks, vs = q2[:, lo:hi], k[:, lo:hi], v[:, lo:hi]
        oslab = None
        for h in range(hpb):
            mask = _lane_mask(d, h)
            sc = _dot(qs * mask, ks, ((1,), (1,))).astype(
                jnp.bfloat16
            ).astype(jnp.float32)
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            if p_ref is not None:
                p_ref[i, j * hpb + h] = p
            ov = _dot(p, vs * mask, ((1,), (0,))).astype(jnp.bfloat16)
            oslab = ov if oslab is None else oslab + ov
        ao = oslab if ao is None else jnp.concatenate([ao, oslab], 1)
    return ao


def _fwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, w1_ref, w2_ref,
                pv_ref, b1_ref, xo_ref, *res_refs,
                heads: int, eps: float, bb: int, with_res: bool):
    seq, hidden = x_ref.shape[1], x_ref.shape[2]
    mlp = w1_ref.shape[1]
    d = hidden // heads
    rows = bb * seq
    bf16 = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
    pv = pv_ref[...]

    x = x_ref[...].reshape(rows, hidden)
    n1, _, _ = _ln_f32(x, pv[_LN1_S], pv[_LN1_B], eps)
    # bf16 Dense semantics: fp32-accumulated dot rounded to bf16, then the
    # bf16-cast bias added (matches flax nn.Dense(dtype=bf16))
    q = bf16(_dot(n1, wq_ref[...], ((1,), (0,)))) + bf16(pv[_BQ])
    k = bf16(_dot(n1, wk_ref[...], ((1,), (0,)))) + bf16(pv[_BK])
    v = bf16(_dot(n1, wv_ref[...], ((1,), (0,)))) + bf16(pv[_BV])

    scale = float(1.0 / np.sqrt(d))
    p_ref = res_refs[2] if with_res else None
    ao_parts = []
    for i in range(bb):
        sl = slice(i * seq, (i + 1) * seq)
        ao_parts.append(
            _attention_fwd(q[sl], k[sl], v[sl], i, seq, heads, d, scale,
                           p_ref)
        )
    ao = jnp.concatenate(ao_parts, 0) if bb > 1 else ao_parts[0]
    y1 = bf16(_dot(ao, wo_ref[...], ((1,), (0,)))) + bf16(pv[_BO])
    x1 = x + bf16(pv[_LS1]) * y1

    n2, _, _ = _ln_f32(x1, pv[_LN2_S], pv[_LN2_B], eps)
    hc = bf16(_dot(n2, w1_ref[...], ((1,), (0,)))) + bf16(b1_ref[0])
    h = bf16(gelu_exact_poly_f32(hc.astype(jnp.float32)))
    y2 = bf16(_dot(h, w2_ref[...], ((1,), (0,)))) + bf16(pv[_B2])
    xo = x1 + bf16(pv[_LS2]) * y2
    xo_ref[...] = xo.reshape(bb, seq, hidden)

    if with_res:
        x1_ref, qkv_ref, _, hc_ref, y1_ref, y2_ref = res_refs
        x1_ref[...] = x1.reshape(bb, seq, hidden)
        qkv_ref[...] = jnp.concatenate([q, k, v], 1).reshape(
            bb, seq, 3 * hidden
        )
        hc_ref[...] = hc.reshape(bb, seq, mlp)
        y1_ref[...] = y1.reshape(bb, seq, hidden)
        y2_ref[...] = y2.reshape(bb, seq, hidden)


def _bwd_kernel(g_ref, x_ref, x1_ref, qkv_ref, p_ref, hc_ref, y1_ref,
                y2_ref, wq_ref, wk_ref, wv_ref, wo_ref, w1_ref, w2_ref,
                pv_ref,
                dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dw1_ref,
                dw2_ref, dpv_ref, db1_ref,
                *, heads: int, eps: float, bb: int):
    seq, hidden = x_ref.shape[1], x_ref.shape[2]
    mlp = w1_ref.shape[1]
    d = hidden // heads
    hpb = _LANES // d
    rows = bb * seq
    bf16 = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
    f32 = lambda a: a.astype(jnp.float32)  # noqa: E731
    pv = pv_ref[...]
    nb = pl.program_id(0)

    @pl.when(nb == 0)
    def _zero():
        for ref in (dwq_ref, dwk_ref, dwv_ref, dwo_ref, dw1_ref, dw2_ref,
                    dpv_ref, db1_ref):
            ref[...] = jnp.zeros_like(ref)

    g = g_ref[...].reshape(rows, hidden)
    y2 = y2_ref[...].reshape(rows, hidden)
    hc = hc_ref[...].reshape(rows, mlp)
    x1 = x1_ref[...].reshape(rows, hidden)

    # ---- MLP half ----
    dls2 = jnp.sum(f32(g) * f32(y2), axis=0)
    dy2 = g * bf16(pv[_LS2])
    db2 = jnp.sum(f32(dy2), axis=0)
    h = bf16(gelu_exact_poly_f32(f32(hc)))
    dw2_ref[...] += _dot(h, dy2, ((0,), (0,)))
    dh = bf16(_dot(dy2, w2_ref[...], ((1,), (1,))))
    dhc = bf16(_gelu_bwd_f32(hc)) * dh
    db1 = jnp.sum(f32(dhc), axis=0)
    n2, xhat2, rs2 = _ln_f32(x1, pv[_LN2_S], pv[_LN2_B], eps)
    dw1_ref[...] += _dot(n2, dhc, ((0,), (0,)))
    dn2 = _dot(dhc, w1_ref[...], ((1,), (1,)))  # f32 (rows, hidden)
    dscale2 = jnp.sum(dn2 * xhat2, axis=0)
    dbias2 = jnp.sum(dn2, axis=0)
    dx1 = g + bf16(_ln_bwd_f32(dn2, xhat2, rs2, pv[_LN2_S]))

    # ---- attention half ----
    y1 = y1_ref[...].reshape(rows, hidden)
    dls1 = jnp.sum(f32(dx1) * f32(y1), axis=0)
    dy1 = dx1 * bf16(pv[_LS1])
    dbo = jnp.sum(f32(dy1), axis=0)
    dao = bf16(_dot(dy1, wo_ref[...], ((1,), (1,))))
    qkv = qkv_ref[...].reshape(rows, 3 * hidden)
    scale = float(1.0 / np.sqrt(d))

    ao_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for i in range(bb):
        sl = slice(i * seq, (i + 1) * seq)
        qi = qkv[sl, 0:hidden] * jnp.bfloat16(scale)  # scaled q, as in fwd
        ki = qkv[sl, hidden:2 * hidden]
        vi = qkv[sl, 2 * hidden:3 * hidden]
        gi = dao[sl]
        ao_i, dq_i, dk_i, dv_i = [], [], [], []
        for j in range(hidden // _LANES):
            lo, hi = j * _LANES, (j + 1) * _LANES
            ks, vs, q2s = ki[:, lo:hi], vi[:, lo:hi], qi[:, lo:hi]
            gs = gi[:, lo:hi]
            aoslab = dqs = dks = dvs = None
            for h2 in range(hpb):
                mask = _lane_mask(d, h2)
                p = p_ref[i, j * hpb + h2]  # (S, S) bf16
                # recompute ao (the fc-in of the out-projection): cheaper
                # than storing another 25 MB/layer stream
                ov = _dot(p, vs * mask, ((1,), (0,))).astype(jnp.bfloat16)
                aoslab = ov if aoslab is None else aoslab + ov
                gh = gs * mask
                dvh = _dot(p, gh, ((0,), (0,))).astype(jnp.bfloat16)
                dp = _dot(gh, vs * mask, ((1,), (1,)))
                pf = f32(p)
                dpp = dp * pf
                ds = (
                    dpp - pf * jnp.sum(dpp, axis=-1, keepdims=True)
                ).astype(jnp.bfloat16)
                dqh = (
                    _dot(ds, ks * mask, ((1,), (0,))) * jnp.float32(scale)
                ).astype(jnp.bfloat16)
                dkh = _dot(ds, q2s * mask, ((0,), (0,))).astype(jnp.bfloat16)
                dqs = dqh if dqs is None else dqs + dqh
                dks = dkh if dks is None else dks + dkh
                dvs = dvh if dvs is None else dvs + dvh
            ao_i.append(aoslab)
            dq_i.append(dqs)
            dk_i.append(dks)
            dv_i.append(dvs)
        cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps, 1)
        ao_parts.append(cat(ao_i))
        dq_parts.append(cat(dq_i))
        dk_parts.append(cat(dk_i))
        dv_parts.append(cat(dv_i))
    catr = lambda ps: ps[0] if bb == 1 else jnp.concatenate(ps, 0)
    ao = catr(ao_parts)
    dq, dk, dv = catr(dq_parts), catr(dk_parts), catr(dv_parts)

    dwo_ref[...] += _dot(ao, dy1, ((0,), (0,)))
    dbq = jnp.sum(f32(dq), axis=0)
    dbk = jnp.sum(f32(dk), axis=0)
    dbv = jnp.sum(f32(dv), axis=0)
    x = x_ref[...].reshape(rows, hidden)
    n1, xhat1, rs1 = _ln_f32(x, pv[_LN1_S], pv[_LN1_B], eps)
    dwq_ref[...] += _dot(n1, dq, ((0,), (0,)))
    dwk_ref[...] += _dot(n1, dk, ((0,), (0,)))
    dwv_ref[...] += _dot(n1, dv, ((0,), (0,)))
    dn1 = (
        _dot(dq, wq_ref[...], ((1,), (1,)))
        + _dot(dk, wk_ref[...], ((1,), (1,)))
        + _dot(dv, wv_ref[...], ((1,), (1,)))
    )
    dscale1 = jnp.sum(dn1 * xhat1, axis=0)
    dbias1 = jnp.sum(dn1, axis=0)
    dx = dx1 + bf16(_ln_bwd_f32(dn1, xhat1, rs1, pv[_LN1_S]))
    dx_ref[...] = dx.reshape(bb, seq, hidden)

    dpv_ref[...] += jnp.stack([
        dbq, dbk, dbv, dbo, db2,
        dscale1, dbias1, dscale2, dbias2, dls1, dls2,
    ])
    db1_ref[...] += db1[None]


def _pick_bb(batch, want, env=None):
    """Largest divisor of `batch` <= want. `env` names an env-var override
    (on-chip block-size tuning without a rebuild)."""
    import os

    if env is not None:
        want = int(os.environ.get(env, want))
    bb = min(want, batch)
    while batch % bb:
        bb -= 1
    return bb


def _fwd_call(x, wq, wk, wv, wo, w1, w2, pv, b1, heads, eps, with_res,
              interpret):
    b, seq, hidden = x.shape
    mlp = w1.shape[1]
    assert hidden % _LANES == 0, hidden
    assert pv.shape == (11, hidden), pv.shape
    bb = _pick_bb(b, 8 if not with_res else 4,
                  env=("HYPERVLA_LAYER_KERNEL_BB_FWD"
                       if with_res else
                       "HYPERVLA_LAYER_KERNEL_BB_INFER"))
    grid = (b // bb,)
    blk = lambda last: pl.BlockSpec((bb, seq, last), lambda nb: (nb, 0, 0))
    const = lambda *shape: pl.BlockSpec(shape, lambda nb: (0,) * len(shape))
    out_shapes = [jax.ShapeDtypeStruct((b, seq, hidden), jnp.bfloat16)]
    out_specs = [blk(hidden)]
    if with_res:
        out_shapes += [
            jax.ShapeDtypeStruct((b, seq, hidden), jnp.bfloat16),   # x1
            jax.ShapeDtypeStruct((b, seq, 3 * hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, heads, seq, seq), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, seq, mlp), jnp.bfloat16),      # hc
            jax.ShapeDtypeStruct((b, seq, hidden), jnp.bfloat16),   # y1
            jax.ShapeDtypeStruct((b, seq, hidden), jnp.bfloat16),   # y2
        ]
        out_specs += [
            blk(hidden),
            blk(3 * hidden),
            pl.BlockSpec((bb, heads, seq, seq), lambda nb: (nb, 0, 0, 0)),
            blk(mlp),
            blk(hidden),
            blk(hidden),
        ]
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, heads=heads, eps=eps, bb=bb, with_res=with_res
        ),
        grid=grid,
        in_specs=[
            blk(hidden),
            const(hidden, hidden), const(hidden, hidden),
            const(hidden, hidden), const(hidden, hidden),
            const(hidden, mlp), const(mlp, hidden),
            const(11, hidden), const(1, mlp),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wq, wk, wv, wo, w1, w2, pv, b1)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def dino_layer_train(x, wq, wk, wv, wo, w1, w2, pv, b1, heads, eps):
    """One DINOv2 transformer layer as a single Pallas call.

    x: (B, S, H) bf16; wq/wk/wv/wo: (H, H) bf16; w1: (H, 4H) bf16;
    w2: (4H, H) bf16; pv: (11, H) fp32 packed vectors
    [bq bk bv bo b2 ln1_s ln1_b ln2_s ln2_b ls1 ls2] (layer scales already
    multiplied by layerscale_value); b1: (1, 4H) fp32. Returns (B, S, H)
    bf16. Differentiable (custom VJP); the undifferentiated call skips the
    residual outputs entirely (frozen-encoder forward costs no extra HBM).
    """
    interpret = jax.default_backend() == "cpu"
    return _fwd_call(
        x, wq, wk, wv, wo, w1, w2, pv, b1, heads, eps,
        with_res=False, interpret=interpret,
    )[0]


def _vjp_fwd(x, wq, wk, wv, wo, w1, w2, pv, b1, heads, eps):
    interpret = jax.default_backend() == "cpu"
    xo, x1, qkv, probs, hc, y1, y2 = _fwd_call(
        x, wq, wk, wv, wo, w1, w2, pv, b1, heads, eps,
        with_res=True, interpret=interpret,
    )
    return xo, (x, wq, wk, wv, wo, w1, w2, pv, x1, qkv, probs, hc, y1, y2)


def _vjp_bwd(heads, eps, res, g):
    (x, wq, wk, wv, wo, w1, w2, pv, x1, qkv, probs, hc, y1, y2) = res
    interpret = jax.default_backend() == "cpu"
    b, seq, hidden = x.shape
    mlp = w1.shape[1]
    bb = _pick_bb(b, 2, env="HYPERVLA_LAYER_KERNEL_BB_BWD")
    grid = (b // bb,)
    blk = lambda last: pl.BlockSpec((bb, seq, last), lambda nb: (nb, 0, 0))
    const = lambda *shape: pl.BlockSpec(shape, lambda nb: (0,) * len(shape))
    f32 = jnp.float32
    dx, dwq, dwk, dwv, dwo, dw1, dw2, dpv, db1 = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, eps=eps, bb=bb),
        grid=grid,
        in_specs=[
            blk(hidden), blk(hidden), blk(hidden), blk(3 * hidden),
            pl.BlockSpec((bb, heads, seq, seq), lambda nb: (nb, 0, 0, 0)),
            blk(mlp), blk(hidden), blk(hidden),
            const(hidden, hidden), const(hidden, hidden),
            const(hidden, hidden), const(hidden, hidden),
            const(hidden, mlp), const(mlp, hidden),
            const(11, hidden),
        ],
        out_specs=[
            blk(hidden),
            const(hidden, hidden), const(hidden, hidden),
            const(hidden, hidden), const(hidden, hidden),
            const(hidden, mlp), const(mlp, hidden),
            const(11, hidden), const(1, mlp),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, seq, hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((hidden, hidden), f32),
            jax.ShapeDtypeStruct((hidden, hidden), f32),
            jax.ShapeDtypeStruct((hidden, hidden), f32),
            jax.ShapeDtypeStruct((hidden, hidden), f32),
            jax.ShapeDtypeStruct((hidden, mlp), f32),
            jax.ShapeDtypeStruct((mlp, hidden), f32),
            jax.ShapeDtypeStruct((11, hidden), f32),
            jax.ShapeDtypeStruct((1, mlp), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(g.astype(jnp.bfloat16), x, x1, qkv, probs, hc, y1, y2,
      wq, wk, wv, wo, w1, w2, pv)
    bf = jnp.bfloat16
    return (dx, dwq.astype(bf), dwk.astype(bf), dwv.astype(bf),
            dwo.astype(bf), dw1.astype(bf), dw2.astype(bf), dpv, db1)


dino_layer_train.defvjp(_vjp_fwd, _vjp_bwd)
