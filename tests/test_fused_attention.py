"""Parity of the fused training MHA kernel (ops/fused_attention.py)
against the XLA einsum attention path it replaces, forward and backward."""
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.ops.fused_attention import mha_fused_train

B, S, H, D = 4, 33, 4, 64


def _einsum_ref(qf, kf, vf, heads, scale):
    """The _SelfAttention einsum path on [B,S,H*D] operands (bf16 trunk
    semantics: bf16 score rounding, fp32 softmax, bf16 probabilities)."""
    b, s, hd = qf.shape
    d = hd // heads
    q = qf.reshape(b, s, heads, d) * jnp.bfloat16(scale)
    k = kf.reshape(b, s, heads, d)
    v = vf.reshape(b, s, heads, d)
    w = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(b, s, hd)


def _setup():
    rs = np.random.RandomState(0)
    mk = lambda seed: jnp.asarray(
        np.random.RandomState(seed).randn(B, S, H * D), jnp.bfloat16
    )
    return mk(0), mk(1), mk(2)


def test_forward_matches_einsum_path():
    q, k, v = _setup()
    scale = 1.0 / np.sqrt(D)
    got = mha_fused_train(q, k, v, H, scale).astype(jnp.float32)
    ref = _einsum_ref(q, k, v, H, scale).astype(jnp.float32)
    # identical rounding points -> near-bitwise (summation order may vary)
    assert float(jnp.abs(got - ref).max()) <= 2e-3, float(
        jnp.abs(got - ref).max()
    )


def test_backward_tracks_einsum_autodiff():
    q, k, v = _setup()
    scale = 1.0 / np.sqrt(D)
    g = jnp.asarray(np.random.RandomState(3).randn(B, S, H * D), jnp.bfloat16)

    ref, ref_vjp = jax.vjp(
        lambda q, k, v: _einsum_ref(q, k, v, H, scale), q, k, v
    )
    got, got_vjp = jax.vjp(
        lambda q, k, v: mha_fused_train(q, k, v, H, scale), q, k, v
    )
    refs = ref_vjp(g)
    gots = got_vjp(g)
    for name, r, o in zip("qkv", refs, gots):
        rf = r.astype(jnp.float32).ravel()
        of = o.astype(jnp.float32).ravel()
        cos = float(
            jnp.vdot(rf, of)
            / (jnp.linalg.norm(rf) * jnp.linalg.norm(of) + 1e-9)
        )
        assert cos > 0.999, (name, cos)


def test_odd_batch_block():
    """Batch sizes not divisible by 8 pick a smaller block and still match."""
    rs = np.random.RandomState(1)
    mk = lambda seed: jnp.asarray(
        np.random.RandomState(seed).randn(2, S, H * D), jnp.bfloat16
    )
    q, k, v = mk(0), mk(1), mk(2)
    scale = 1.0 / np.sqrt(D)
    got = mha_fused_train(q, k, v, H, scale).astype(jnp.float32)
    ref = _einsum_ref(q, k, v, H, scale).astype(jnp.float32)
    assert float(jnp.abs(got - ref).max()) <= 2e-3


def test_trunk_route_fused_attention():
    """fused_attention=True routes through DINOv2Model and its grads track
    the einsum trunk."""
    from hypervla_tpu.models.encoders.dinov2 import (
        DINOv2Config,
        DINOv2Model,
    )

    cfg = DINOv2Config(
        hidden_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        patch_size=14,
        image_size=28,
    )
    rs = np.random.RandomState(0)
    pix = jnp.asarray(rs.rand(2, 28, 28, 3), jnp.float32)

    outs = {}
    for fused in (False, True):
        model = DINOv2Model(
            cfg, dtype=jnp.bfloat16, fused_attention=fused
        )
        params = model.init(jax.random.PRNGKey(0), pix)

        def loss(p):
            out = model.apply(p, pix).last_hidden_state
            return jnp.sum(out.astype(jnp.float32) ** 2)

        val, grad = jax.value_and_grad(loss)(params)
        outs[fused] = (val, grad)

    v0, g0 = outs[False]
    v1, g1 = outs[True]
    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-2)
    flat0 = jax.flatten_util.ravel_pytree(g0)[0].astype(jnp.float32)
    flat1 = jax.flatten_util.ravel_pytree(g1)[0].astype(jnp.float32)
    cos = float(
        jnp.vdot(flat0, flat1)
        / (jnp.linalg.norm(flat0) * jnp.linalg.norm(flat1) + 1e-9)
    )
    assert cos > 0.99, cos
