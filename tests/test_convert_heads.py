"""Converter parity for the re-designed diffusion score network and 1-D
U-Net: reference params -> our layout must reproduce the reference outputs.

Runs the REFERENCE modules (imported from /root/reference via the shims) on
random params, converts with utils/convert.py, and compares forward passes
against this framework's restructured implementations.
"""
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]


@pytest.fixture(scope="module", autouse=True)
def _shims():
    from scripts import reference_shims

    reference_shims.install(dino_hidden=32, dino_layers=2, dino_heads=2,
                            dino_image_size=224)


def test_score_actor_reference_params_convert():
    import jax
    import jax.numpy as jnp

    from octo.model.components.diffusion import (
        create_diffusion_model as ref_create,
    )

    from hypervla_tpu.models.diffusion import create_diffusion_model
    from hypervla_tpu.utils.convert import convert_reference_params

    kwargs = dict(out_dim=14, time_dim=8, num_blocks=3, dropout_rate=0.0,
                  hidden_dim=32, use_layer_norm=True)
    ref = ref_create(**kwargs)
    ours = create_diffusion_model(**kwargs)

    obs = jnp.asarray(np.random.RandomState(0).randn(4, 20), jnp.float32)
    act = jnp.asarray(np.random.RandomState(1).randn(4, 14), jnp.float32)
    t = jnp.asarray(np.random.RandomState(2).rand(4, 1), jnp.float32)

    ref_params = ref.init(jax.random.PRNGKey(0), obs, act, t)["params"]
    ref_out = ref.apply({"params": ref_params}, obs, act, t, train=False)

    converted = convert_reference_params(
        jax.tree_util.tree_map(np.asarray, ref_params)
    )
    # structure must match a fresh init of our module
    ours_params = ours.init(jax.random.PRNGKey(1), obs, act, t)["params"]
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, converted)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, ours_params)
    )
    out = ours.apply({"params": converted}, obs, act, t, train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=1e-5, rtol=1e-5
    )


def test_unet_reference_params_convert():
    import jax
    import jax.numpy as jnp

    from octo.model.components.unet import ConditionalUnet1D as RefUnet

    from hypervla_tpu.models.unet import ConditionalUnet1D
    from hypervla_tpu.utils.convert import convert_reference_params

    kwargs = dict(down_features=(8, 16, 32), mid_layers=2, kernel_size=3,
                  n_groups=2, time_features=8)
    ref = RefUnet(**kwargs)
    ours = ConditionalUnet1D(**kwargs)

    obs = jnp.asarray(np.random.RandomState(0).randn(2, 12), jnp.float32)
    act = jnp.asarray(np.random.RandomState(1).randn(2, 8, 7), jnp.float32)
    t = jnp.asarray(np.random.RandomState(2).rand(2, 1), jnp.float32)

    ref_params = ref.init(jax.random.PRNGKey(0), obs, act, t)["params"]
    ref_out = ref.apply({"params": ref_params}, obs, act, t)

    converted = convert_reference_params(
        jax.tree_util.tree_map(np.asarray, ref_params)
    )
    ours_params = ours.init(jax.random.PRNGKey(1), obs, act, t)["params"]
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, converted)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, ours_params)
    )
    out = ours.apply({"params": converted}, obs, act, t)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=1e-5, rtol=1e-5
    )
