"""Fused residual-add + LayerNorm (ops/add_layer_norm.py::fused_add_ln):
forward/backward parity against the unfused add -> nn.LayerNorm pair, the
shared dx==ddelta cotangent, and the trunk route with the cross-layer
pending-delta plumbing (models/encoders/dinov2.py _Layer/_LayerCollection)."""
import flax.linen as nn
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.ops.add_layer_norm import fused_add_ln


def _setup(dtype, shape):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape) * 2, dtype)
    delta = jnp.asarray(rs.randn(*shape), dtype)
    scale = jnp.asarray(rs.rand(shape[-1]) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(shape[-1]) * 0.1, jnp.float32)
    return x, delta, scale, bias


def _ref(x, delta, scale, bias):
    xn = x + delta  # same per-op rounding as the unfused trunk
    y = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, xn.astype(jnp.float32)
    )
    return xn, y


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(4, 33, 768), (257, 256)])
def test_forward_matches_unfused_pair(dtype, shape):
    x, delta, scale, bias = _setup(dtype, shape)
    xn, y = fused_add_ln(x, delta, scale, bias, 1e-6)
    rxn, ry = _ref(x, delta, scale, bias)
    np.testing.assert_array_equal(np.asarray(xn), np.asarray(rxn))
    tol = 1e-5 if dtype == jnp.float32 else 0.05
    assert float(jnp.abs(y.astype(jnp.float32) - ry).max()) < tol


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_autodiff_both_cotangents(dtype):
    # 114 rows with block_rows=32 -> partial last block: exercises the
    # live-row mask in the dscale/dbias accumulation
    x, delta, scale, bias = _setup(dtype, shape=(2, 57, 768))
    rs = np.random.RandomState(1)
    gxn = jnp.asarray(rs.randn(2, 57, 768), dtype)
    gy = jnp.asarray(rs.randn(2, 57, 768), dtype)

    ref, ref_vjp = jax.vjp(
        lambda x, d, s, b: _ref(x, d, s, b),
        x.astype(jnp.float32), delta.astype(jnp.float32), scale, bias,
    )
    rdx, rdd, rds, rdb = ref_vjp(
        (gxn.astype(jnp.float32), gy.astype(jnp.float32))
    )

    got, got_vjp = jax.vjp(
        lambda x, d, s, b: fused_add_ln(x, d, s, b, 1e-6, 32),
        x, delta, scale, bias,
    )
    gdx, gdd, gds, gdb = got_vjp((gxn, gy))

    # x + delta is symmetric: the two input cotangents must be identical
    np.testing.assert_array_equal(np.asarray(gdx), np.asarray(gdd))

    tol = 1e-4 if dtype == jnp.float32 else 0.25
    assert float(jnp.abs(gdx.astype(jnp.float32) - rdx).max()) < tol
    for got_g, ref_g in ((gds, rds), (gdb, rdb)):
        denom = float(jnp.abs(ref_g).max()) + 1e-6
        rel = float(jnp.abs(got_g - ref_g).max()) / denom
        assert rel < (1e-5 if dtype == jnp.float32 else 0.02), rel


def test_only_y_cotangent():
    """The residual-stream output may be unused (last fused boundary):
    jax feeds a zero cotangent and the kernel must handle it."""
    x, delta, scale, bias = _setup(jnp.float32, shape=(8, 768))

    def f(x, d):
        _, y = fused_add_ln(x, d, scale, bias, 1e-6)
        return jnp.sum(y ** 2)

    def ref(x, d):
        _, y = _ref(x, d, scale, bias)
        return jnp.sum(y ** 2)

    gx, gd = jax.grad(f, argnums=(0, 1))(x, delta)
    rx, rd = jax.grad(ref, argnums=(0, 1))(x, delta)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd), atol=1e-4)


@pytest.mark.slow
def test_trunk_route_fused_add_ln():
    """fused_add_ln=True routes the whole trunk (cross-layer pending-delta
    form) and is differentiable; outputs and grads track the plain trunk,
    and the param tree is layout-identical."""
    from hypervla_tpu.models.encoders.dinov2 import (
        DINOv2Config,
        DINOv2Model,
    )

    cfg = dict(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        patch_size=14,
        image_size=28,
    )
    rs = np.random.RandomState(0)
    pix = jnp.asarray(rs.rand(2, 28, 28, 3), jnp.float32)

    outs = {}
    params_trees = {}
    for fused in (False, True):
        model = DINOv2Model(
            DINOv2Config(**cfg), dtype=jnp.float32, fused_add_ln=fused
        )
        params = model.init(jax.random.PRNGKey(0), pix)
        params_trees[fused] = params

        def loss(p):
            return jnp.sum(model.apply(p, pix).last_hidden_state ** 2)

        val, grad = jax.value_and_grad(loss)(params)
        outs[fused] = (val, grad)

    # identical checkpoint layout with and without the fusion
    assert jax.tree_util.tree_structure(
        params_trees[False]
    ) == jax.tree_util.tree_structure(params_trees[True])

    v0, g0 = outs[False]
    v1, g1 = outs[True]
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-4)
    flat0 = jax.flatten_util.ravel_pytree(g0)[0]
    flat1 = jax.flatten_util.ravel_pytree(g1)[0]
    cos = float(
        jnp.vdot(flat0, flat1)
        / (jnp.linalg.norm(flat0) * jnp.linalg.norm(flat1) + 1e-9)
    )
    assert cos > 0.999, cos


def _ref_scaled(x, delta, ls, scale, bias):
    # mirror _LayerScale + residual add + nn.LayerNorm per-op roundings
    xn = x + ls.astype(x.dtype) * delta
    y = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, xn.astype(jnp.float32)
    )
    return xn, y


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_scaled_forward_matches_unfused_chain(dtype):
    from hypervla_tpu.ops.add_layer_norm import fused_add_scale_ln

    x, delta, scale, bias = _setup(dtype, (4, 33, 768))
    ls = jnp.asarray(np.random.RandomState(2).rand(768) * 0.1, jnp.float32)
    xn, y = fused_add_scale_ln(x, delta, ls, scale, bias, 1e-6)
    rxn, ry = _ref_scaled(x, delta, ls, scale, bias)
    if dtype == jnp.bfloat16:
        # both paths round mul then add to bf16: bitwise identical
        np.testing.assert_array_equal(np.asarray(xn), np.asarray(rxn))
    else:
        # fp32: the backends may contract x + ls*delta into an FMA in one
        # path and not the other — allow the one-ulp band
        np.testing.assert_allclose(
            np.asarray(xn), np.asarray(rxn), rtol=1e-6, atol=1e-6
        )
    tol = 2e-5 if dtype == jnp.float32 else 0.05
    assert float(jnp.abs(y.astype(jnp.float32) - ry).max()) < tol


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_scaled_grads_match_autodiff(dtype):
    from hypervla_tpu.ops.add_layer_norm import fused_add_scale_ln

    x, delta, scale, bias = _setup(dtype, shape=(2, 57, 768))
    ls = jnp.asarray(np.random.RandomState(2).rand(768) * 0.1, jnp.float32)
    rs = np.random.RandomState(1)
    gxn = jnp.asarray(rs.randn(2, 57, 768), dtype)
    gy = jnp.asarray(rs.randn(2, 57, 768), dtype)

    ref, ref_vjp = jax.vjp(
        lambda x, d, l, s, b: _ref_scaled(x, d, l, s, b),
        x.astype(jnp.float32), delta.astype(jnp.float32), ls, scale, bias,
    )
    refs = ref_vjp((gxn.astype(jnp.float32), gy.astype(jnp.float32)))

    got, got_vjp = jax.vjp(
        lambda x, d, l, s, b: fused_add_scale_ln(x, d, l, s, b, 1e-6, 32),
        x, delta, ls, scale, bias,
    )
    gots = got_vjp((gxn, gy))

    names = ["dx", "ddelta", "dls", "dscale", "dbias"]
    for name, got_g, ref_g in zip(names, gots, refs):
        if name in ("dx", "ddelta"):
            tol = 1e-4 if dtype == jnp.float32 else 0.25
            err = float(
                jnp.abs(got_g.astype(jnp.float32) - ref_g).max()
            )
            assert err < tol, (name, err)
        else:
            denom = float(jnp.abs(ref_g).max()) + 1e-6
            rel = float(jnp.abs(got_g - ref_g).max()) / denom
            # dls sums bf16 products of two activation tensors: allow the
            # bf16-accumulation band (the fp32 path stays tight)
            lim = 1e-5 if dtype == jnp.float32 else 0.05
            assert rel < lim, (name, rel)
