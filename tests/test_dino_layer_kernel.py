"""Parity tests for the Pallas streaming DINOv2 serving kernel
(ops/dino_layer.py) against the flax bf16 trunk it replaces."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.models.encoders.dinov2 import (
    DINOv2Config,
    _LayerCollection,
)
from hypervla_tpu.ops.dino_layer import (
    dino_layers_serving,
    stack_serving_layer_params,
)

BASE_GEOM = DINOv2Config()  # dinov2-base: 768 wide, 12 heads


def _make_reference(num_layers, seq, seed=0):
    cfg = DINOv2Config(num_hidden_layers=num_layers)
    module = _LayerCollection(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(seed)
    x = (jax.random.normal(rng, (1, seq, cfg.hidden_size)) * 0.5).astype(
        jnp.bfloat16
    )
    params = module.init(rng, x)["params"]
    # non-trivial layer scales / LN params so the test can't pass with
    # identity-parameter luck
    params = jax.tree_util.tree_map(
        lambda v: v + 0.02 * jax.random.normal(
            jax.random.PRNGKey(hash(v.shape) % 2**31), v.shape, v.dtype
        ) if v.ndim == 1 else v,
        params,
    )
    ref, _ = module.apply({"params": params}, x)
    return params, x, ref


@pytest.mark.parametrize("num_layers,seq", [(2, 257), (3, 128)])
def test_kernel_matches_flax_bf16_trunk(num_layers, seq):
    params, x, ref = _make_reference(num_layers, seq)
    w, b, p = stack_serving_layer_params(params)
    got = dino_layers_serving(x[0], w, b, p, eps=1e-6, interpret=True)
    ref_f = np.asarray(ref[0], np.float32)
    got_f = np.asarray(got, np.float32)
    # both paths round to bf16 at the same points; residual drift over
    # layers stays within a few bf16 ulps of the activation scale
    scale = np.abs(ref_f).max()
    assert np.isfinite(got_f).all()
    assert np.abs(ref_f - got_f).max() < 0.03 * max(scale, 1.0), (
        np.abs(ref_f - got_f).max(),
        scale,
    )


@pytest.mark.parametrize("num_layers,seq", [(2, 257), (3, 128)])
def test_scan_trunk_matches_flax_bf16_trunk(num_layers, seq):
    """The lax.scan twin of the serving kernel: same stacked weights,
    same roundings, must match the flax bf16 trunk as closely as the
    Pallas kernel does (and the kernel itself, tighter)."""
    from hypervla_tpu.ops.dino_layer import dino_layers_serving_scan

    params, x, ref = _make_reference(num_layers, seq)
    w, b, p = stack_serving_layer_params(params)
    got = dino_layers_serving_scan(x[0], w, b, p, eps=1e-6)
    ref_f = np.asarray(ref[0], np.float32)
    got_f = np.asarray(got, np.float32)
    scale = np.abs(ref_f).max()
    assert np.isfinite(got_f).all()
    assert np.abs(ref_f - got_f).max() < 0.03 * max(scale, 1.0), (
        np.abs(ref_f - got_f).max(),
        scale,
    )
    # scan vs Pallas kernel: identical rounding points -> tighter bound
    kern = np.asarray(
        dino_layers_serving(x[0], w, b, p, eps=1e-6, interpret=True),
        np.float32,
    )
    assert np.abs(kern - got_f).max() < 0.01 * max(scale, 1.0), (
        np.abs(kern - got_f).max(),
        scale,
    )


def test_kernel_twelve_layer_shapes():
    """Full dinov2-base depth runs through the grid (interpret mode)."""
    params, x, ref = _make_reference(12, 257)
    w, b, p = stack_serving_layer_params(params)
    assert w.shape == (12, 3, 768, 3072) and w.dtype == jnp.bfloat16
    got = dino_layers_serving(x[0], w, b, p, interpret=True)
    assert got.shape == (257, 768)
    err = np.abs(
        np.asarray(ref[0], np.float32) - np.asarray(got, np.float32)
    ).max()
    scale = np.abs(np.asarray(ref[0], np.float32)).max()
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_dinov2_model_layers_impl_pallas_matches_xla():
    """Module-level wiring: DINOv2Model(layers_impl='pallas_serving') with
    the trunk_kernel collection matches the standard bf16 forward."""
    cfg = DINOv2Config()  # base geometry (the kernel's target)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (1, 56, 56, 3))

    from hypervla_tpu.models.encoders.dinov2 import DINOv2Model

    ref_model = DINOv2Model(config=cfg, dtype=jnp.bfloat16)
    params = ref_model.init(jax.random.PRNGKey(1), pixels)["params"]
    ref = ref_model.apply({"params": params}, pixels).last_hidden_state

    w, b, p = stack_serving_layer_params(
        params["encoder"]["layer"], layerscale_value=cfg.layerscale_value
    )
    kern_model = DINOv2Model(
        config=cfg, dtype=jnp.bfloat16, layers_impl="pallas_serving"
    )
    got = kern_model.apply(
        {"params": params, "trunk_kernel": {"w": w, "b": b, "p": p}},
        pixels,
    ).last_hidden_state
    err = np.abs(np.asarray(ref) - np.asarray(got)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_dinov2_model_layers_impl_scan_matches_xla():
    """Module-level wiring: DINOv2Model(layers_impl='scan_serving') with
    the trunk_kernel collection matches the standard bf16 forward."""
    cfg = DINOv2Config()
    pixels = jax.random.normal(jax.random.PRNGKey(0), (1, 56, 56, 3))

    from hypervla_tpu.models.encoders.dinov2 import DINOv2Model

    ref_model = DINOv2Model(config=cfg, dtype=jnp.bfloat16)
    params = ref_model.init(jax.random.PRNGKey(1), pixels)["params"]
    ref = ref_model.apply({"params": params}, pixels).last_hidden_state

    w, b, p = stack_serving_layer_params(
        params["encoder"]["layer"], layerscale_value=cfg.layerscale_value
    )
    scan_model = DINOv2Model(
        config=cfg, dtype=jnp.bfloat16, layers_impl="scan_serving"
    )
    got = scan_model.apply(
        {"params": params, "trunk_kernel": {"w": w, "b": b, "p": p}},
        pixels,
    ).last_hidden_state
    err = np.abs(np.asarray(ref) - np.asarray(got)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_make_pallas_trunk_net_strips_layer_leaves():
    """make_pallas_trunk_net removes the per-layer trunk leaves from
    'params' and emits the three stacked kernel arrays."""
    import types

    import flax.linen as fnn

    from hypervla_tpu.ops.serving import make_pallas_trunk_net

    vit_kwargs = {
        "encoder_type": "DINOv2",
        "pretrained_encoder_name": "dinov2-base",
        "encoder_dtype": "bfloat16",
    }
    config = {"base_net_kwargs": {"vit_kwargs": vit_kwargs}}

    class _Net(fnn.Module):
        vit_kwargs: dict

        def __call__(self, x):
            return x

    from hypervla_tpu.models.encoders.dinov2 import (
        DINOv2Config,
        DINOv2Model,
    )

    pixels = jax.random.normal(jax.random.PRNGKey(0), (1, 56, 56, 3))
    dino = DINOv2Model(config=DINOv2Config(), dtype=jnp.bfloat16)
    dino_params = dino.init(jax.random.PRNGKey(1), pixels)["params"]
    base_params = {
        "encoder": {"image_encoder": dino_params},
        "head": {"kernel": jnp.zeros((4, 4))},
    }
    model = types.SimpleNamespace(
        config=config, base_net=_Net(vit_kwargs=vit_kwargs)
    )
    serve_net, variables = make_pallas_trunk_net(model, base_params)
    assert serve_net.vit_kwargs["dino_layers_impl"] == "pallas_serving"
    assert "layer" not in variables["params"]["encoder"]["image_encoder"][
        "encoder"
    ]
    tk = variables["trunk_kernel"]["encoder"]["image_encoder"]
    assert tk["w"].shape == (12, 3, 768, 3072)
    assert tk["b"].shape == (12, 3, 3072)
    assert tk["p"].shape == (12, 6, 768)
    # untouched non-trunk leaves survive
    assert variables["params"]["head"]["kernel"].shape == (4, 4)


@pytest.mark.slow
def test_make_serving_step_trunk_kernel_matches_xla():
    """Full serving tick (preprocess -> generated base-net -> unnorm ->
    ensemble) with trunk_kernel=True matches the XLA-trunk tick."""
    import types

    from hypervla_tpu.configs import flagship_pretrain_config
    from hypervla_tpu.models.base_network import BaseNetwork
    from hypervla_tpu.ops.serving import (
        make_pallas_trunk_net,
        make_serving_step,
        prepare_serving_params,
    )

    config = flagship_pretrain_config()
    bk = config["base_net_kwargs"]
    bk["vit_kwargs"]["encoder_dtype"] = "bfloat16"
    bk["vit_kwargs"]["sow_dino_attention"] = False
    bk["vit_kwargs"]["use_flash_attention"] = False
    base_net = BaseNetwork(
        model_type=bk["model_type"],
        action_head_type=bk["action_head_type"],
        octo_kwargs=config.get("model", {}),
        cnn_kwargs=bk.get("cnn_kwargs", {}),
        vit_kwargs=bk["vit_kwargs"],
        action_head_kwargs=bk.get("action_head_kwargs", {}),
        action_horizon=bk["action_horizon"],
        action_dim=bk["action_dim"],
    )
    rng = jax.random.PRNGKey(0)
    images = jax.random.randint(
        rng, (1, 1, 224, 224, 3), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 768))
    params = base_net.init(
        {"params": rng, "dropout": rng},
        {
            "observation": {
                "image_primary": images,
                "timestep_pad_mask": jnp.ones((1, 1)),
            },
            "task": {"language_instruction": {"token_embedding": emb}},
            "action": jnp.zeros((1, 1, bk["action_horizon"], bk["action_dim"])),
            "action_pad_mask": jnp.ones(
                (1, 1, bk["action_horizon"], bk["action_dim"]), bool
            ),
        },
    )["params"]

    model = types.SimpleNamespace(config=config, base_net=base_net)
    params = prepare_serving_params(model, params, image_size=224)
    stats = {"mean": np.zeros(7), "std": np.ones(7)}

    step_xla, init_hist = make_serving_step(
        model, stats, crop=False, ensemble=False
    )
    _, variables = make_pallas_trunk_net(model, params)
    step_kern, _ = make_serving_step(
        model, stats, crop=False, ensemble=False, trunk_kernel=True
    )

    frame = np.asarray(images[0, 0])
    a_ref, _ = step_xla(
        params, frame, emb, init_hist(), jnp.zeros((), jnp.int32), rng
    )
    a_kern, _ = step_kern(
        variables, frame, emb, init_hist(), jnp.zeros((), jnp.int32), rng
    )
    a_ref = np.asarray(a_ref, np.float32)
    a_kern = np.asarray(a_kern, np.float32)
    assert np.isfinite(a_kern).all()
    scale = np.abs(a_ref).max() + 1e-3
    assert np.abs(a_ref - a_kern).max() < 0.05 * scale, (a_ref, a_kern)

    # scan twin: same stacked weights via trunk_kernel="scan"
    step_scan, _ = make_serving_step(
        model, stats, crop=False, ensemble=False, trunk_kernel="scan"
    )
    a_scan, _ = step_scan(
        variables, frame, emb, init_hist(), jnp.zeros((), jnp.int32), rng
    )
    a_scan = np.asarray(a_scan, np.float32)
    assert np.isfinite(a_scan).all()
    assert np.abs(a_ref - a_scan).max() < 0.05 * scale, (a_ref, a_scan)


@pytest.mark.parametrize("hidden,heads", [(384, 6), (1024, 16)])
def test_kernel_other_geometries(hidden, heads):
    """dinov2-small and dinov2-large geometries run through the same
    kernel (head_dim 64, mlp_ratio 4)."""
    cfg = DINOv2Config(
        hidden_size=hidden, num_hidden_layers=2, num_attention_heads=heads
    )
    module = _LayerCollection(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = (jax.random.normal(rng, (1, 128, hidden)) * 0.5).astype(jnp.bfloat16)
    params = module.init(rng, x)["params"]
    ref, _ = module.apply({"params": params}, x)
    w, b, p = stack_serving_layer_params(params)
    assert w.shape == (2, 3, hidden, 4 * hidden)
    got = dino_layers_serving(x[0], w, b, p, interpret=True)
    err = np.abs(
        np.asarray(ref[0], np.float32) - np.asarray(got, np.float32)
    ).max()
    scale = np.abs(np.asarray(ref[0], np.float32)).max()
    assert err < 0.03 * max(scale, 1.0), (err, scale)


@pytest.mark.parametrize("num_layers,seq", [(2, 257), (3, 128)])
def test_unroll_trunk_matches_scan(num_layers, seq):
    """The statically-unrolled twin shares the scan trunk's exact layer
    body (_serving_layer_body); XLA may still tile the dots differently
    between the two compilations (different fp32 accumulation order under
    one bf16 rounding), so the bound is the tight same-rounding-points
    one used for scan-vs-kernel, not bitwise."""
    from hypervla_tpu.ops.dino_layer import (
        dino_layers_serving_scan,
        dino_layers_serving_unroll,
    )

    params, x, ref = _make_reference(num_layers, seq)
    w, b, p = stack_serving_layer_params(params)
    got = np.asarray(
        dino_layers_serving_unroll(x[0], w, b, p, eps=1e-6), np.float32
    )
    ref_scan = np.asarray(
        dino_layers_serving_scan(x[0], w, b, p, eps=1e-6), np.float32
    )
    scale = np.abs(ref_scan).max()
    assert np.isfinite(got).all()
    assert np.abs(ref_scan - got).max() < 0.01 * max(scale, 1.0), (
        np.abs(ref_scan - got).max(), scale,
    )
    # and against the flax bf16 trunk like the other twins
    ref_f = np.asarray(ref[0], np.float32)
    assert np.abs(ref_f - got).max() < 0.03 * max(scale, 1.0)


def test_dinov2_model_layers_impl_unroll_matches_scan():
    """Module-level wiring: layers_impl='unroll_serving' matches the scan
    wiring through DINOv2Model.apply (same rounding points; compilation
    may reorder fp32 accumulation inside the dots)."""
    from hypervla_tpu.models.encoders.dinov2 import DINOv2Model

    cfg = DINOv2Config()
    pix = jax.random.normal(jax.random.PRNGKey(0), (1, 56, 56, 3))
    model = DINOv2Model(config=cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), pix)["params"]
    w, b, p = stack_serving_layer_params(
        params["encoder"]["layer"], layerscale_value=cfg.layerscale_value
    )
    outs = {}
    for impl in ("scan_serving", "unroll_serving"):
        m = DINOv2Model(config=cfg, dtype=jnp.bfloat16, layers_impl=impl)
        outs[impl] = np.asarray(
            m.apply(
                {"params": params,
                 "trunk_kernel": {"w": w, "b": b, "p": p}},
                pix,
            ).last_hidden_state,
            np.float32,
        )
    scale = np.abs(outs["scan_serving"]).max()
    assert np.abs(
        outs["scan_serving"] - outs["unroll_serving"]
    ).max() < 0.01 * max(scale, 1.0)
