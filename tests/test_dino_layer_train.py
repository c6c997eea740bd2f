"""Parity tests for the batched training DINO layer kernel
(ops/dino_layer_train.py) against the flax bf16 trunk it replaces.

Geometry: the kernel needs hidden % 128 == 0 and head_dim <= 128, so the
tests run a 128-wide 2-head trunk (d=64: two heads per 128-lane slab, the
dinov2-base slab shape) in Pallas interpret mode on CPU.
"""
import dataclasses

import flax.linen as nn  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.models.encoders.dinov2 import (
    DINOv2Config,
    _KernelLayerCollection,
    _LayerCollection,
)

CFG = DINOv2Config(
    hidden_size=128, num_attention_heads=2, num_hidden_layers=2,
    layerscale_value=1.0,
)


def _params_and_input(cfg, batch=4, seq=17, seed=0):
    module = _LayerCollection(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(seed)
    x = (jax.random.normal(rng, (batch, seq, cfg.hidden_size)) * 0.5).astype(
        jnp.bfloat16
    )
    params = module.init(rng, x)["params"]
    # non-trivial 1-D params (LN scales, biases, layer scales) so parity
    # can't pass on identity-parameter luck
    params = jax.tree_util.tree_map(
        lambda v: v + 0.02 * jax.random.normal(
            jax.random.PRNGKey(hash(v.shape) % 2**31), v.shape, v.dtype
        ) if v.ndim == 1 else v,
        params,
    )
    return module, params, x


def _kernel_module(cfg):
    return _KernelLayerCollection(cfg, dtype=jnp.bfloat16)


@pytest.mark.parametrize("batch,seq", [(4, 17), (3, 33)])
def test_forward_matches_flax_bf16_trunk(batch, seq):
    module, params, x = _params_and_input(CFG, batch=batch, seq=seq)
    ref, _ = module.apply({"params": params}, x)
    got, _ = _kernel_module(CFG).apply({"params": params}, x)
    ref_f = np.asarray(ref, np.float32)
    got_f = np.asarray(got, np.float32)
    scale = np.abs(ref_f).max()
    assert np.isfinite(got_f).all()
    assert np.abs(ref_f - got_f).max() < 0.03 * max(scale, 1.0), (
        np.abs(ref_f - got_f).max(), scale,
    )


def test_param_layout_identical():
    """Checkpoints must move between the kernel and module paths without
    conversion: identical flattened paths, shapes, and dtypes."""
    module, params, x = _params_and_input(CFG)
    kparams = _kernel_module(CFG).init(jax.random.PRNGKey(0), x)["params"]

    def flat(p):
        return {
            jax.tree_util.keystr(k): (v.shape, v.dtype)
            for k, v in jax.tree_util.tree_flatten_with_path(p)[0]
        }

    assert flat(params) == flat(kparams)


def _grads(module, params, x, cot):
    def loss(params, x):
        out, _ = module.apply({"params": params}, x)
        return jnp.sum(out.astype(jnp.float32) * cot)

    return jax.grad(loss, argnums=(0, 1))(params, x)


def _cosine(a, b):
    af = np.asarray(a, np.float64).ravel()
    bf = np.asarray(b, np.float64).ravel()
    n = np.linalg.norm(af) * np.linalg.norm(bf)
    if n == 0:
        return 1.0 if np.allclose(af, bf) else 0.0
    return float(af @ bf / n)


def test_gradients_match_autodiff():
    """Per-leaf gradient cosine vs the XLA autodiff of the standard bf16
    trunk. One layer: two equally-valid bf16 trunk implementations
    decorrelate through stacked layers at random init (PERF.md round-3
    'bf16 gradient chaos' note), so depth-1 is the honest comparison."""
    cfg = dataclasses.replace(CFG, num_hidden_layers=1)
    module, params, x = _params_and_input(cfg, batch=4, seq=17)
    cot = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)
    ref_dp, ref_dx = _grads(module, params, x, cot)
    got_dp, got_dx = _grads(_kernel_module(cfg), params, x, cot)

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_dp)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got_dp)[0]
    norms = [float(np.linalg.norm(np.asarray(v, np.float32)))
             for _, v in flat_ref]
    typical = float(np.median(norms))
    for (path, rv), (_, gv), rn in zip(flat_ref, flat_got, norms):
        gn = float(np.linalg.norm(np.asarray(gv, np.float32)))
        if rn < 1e-2 * typical:
            # mathematically-degenerate leaf (e.g. the key bias: softmax is
            # invariant to a uniform key shift, so its exact gradient is 0
            # and both implementations produce bf16 rounding noise) — just
            # require the kernel's noise to be equally negligible
            assert gn < 1e-1 * typical, (jax.tree_util.keystr(path), rn, gn)
            continue
        c = _cosine(rv, gv)
        assert c > 0.99, (jax.tree_util.keystr(path), c)
    assert _cosine(ref_dx, got_dx) > 0.99


def test_primal_and_vjp_forward_agree():
    """The undifferentiated call (no residual outputs) and the residual-
    saving VJP forward must produce the same activations."""
    cfg = dataclasses.replace(CFG, num_hidden_layers=1)
    module, params, x = _params_and_input(cfg)
    kmod = _kernel_module(cfg)
    primal, _ = kmod.apply({"params": params}, x)

    def f(x):
        out, _ = kmod.apply({"params": params}, x)
        return out

    vjp_out, _ = jax.vjp(f, x)
    np.testing.assert_array_equal(
        np.asarray(primal, np.float32), np.asarray(vjp_out, np.float32)
    )


def test_forward_at_dinov2_small_geometry():
    """384-wide 6-head (dinov2-small slab shape: 3 slabs of 128 lanes)."""
    cfg = DINOv2Config(
        hidden_size=384, num_attention_heads=6, num_hidden_layers=1,
    )
    module, params, x = _params_and_input(cfg, batch=2, seq=9)
    ref, _ = module.apply({"params": params}, x)
    got, _ = _kernel_module(cfg).apply({"params": params}, x)
    ref_f = np.asarray(ref, np.float32)
    got_f = np.asarray(got, np.float32)
    scale = np.abs(ref_f).max()
    assert np.abs(ref_f - got_f).max() < 0.03 * max(scale, 1.0)


def test_weight_grad_accumulates_over_batch():
    """Weight cotangents must sum over the whole batch (the kernel
    accumulates across its batch-block grid): grads at batch 4 equal the
    sum of grads over the two half-batches."""
    cfg = dataclasses.replace(CFG, num_hidden_layers=1)
    module, params, x = _params_and_input(cfg, batch=4, seq=17)
    kmod = _kernel_module(cfg)
    cot = jnp.ones(x.shape, jnp.float32)
    full_dp, _ = _grads(kmod, params, x, cot)
    h1, _ = _grads(kmod, params, x[:2], cot[:2])
    h2, _ = _grads(kmod, params, x[2:], cot[2:])
    for (path, fv), (_, av), (_, bv) in zip(
        jax.tree_util.tree_flatten_with_path(full_dp)[0],
        jax.tree_util.tree_flatten_with_path(h1)[0],
        jax.tree_util.tree_flatten_with_path(h2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(fv, np.float32),
            np.asarray(av, np.float32) + np.asarray(bv, np.float32),
            rtol=0.05, atol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )
