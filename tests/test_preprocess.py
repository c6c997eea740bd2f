"""Tests for the fused device-side image preprocessing ops."""
import jax
import jax.numpy as jnp
import numpy as np

from hypervla_tpu.ops import preprocess


def test_resize_identity():
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3)).astype(np.uint8)
    out = preprocess.resize_image(jnp.asarray(img), (32, 32))
    np.testing.assert_array_equal(np.asarray(out), img)


def test_resize_shape_dtype():
    img = np.random.RandomState(0).randint(0, 255, (64, 48, 3)).astype(np.uint8)
    out = np.asarray(preprocess.resize_image(jnp.asarray(img), (32, 24)))
    assert out.shape == (32, 24, 3) and out.dtype == np.uint8
    # constant image stays constant under lanczos
    const = np.full((64, 64, 3), 100, np.uint8)
    out = np.asarray(preprocess.resize_image(jnp.asarray(const), (20, 20)))
    assert np.abs(out.astype(int) - 100).max() <= 1


def test_augment_image_ranges():
    rng = jax.random.PRNGKey(0)
    img = np.random.RandomState(1).randint(0, 255, (32, 32, 3)).astype(np.uint8)
    kwargs = dict(
        random_resized_crop=dict(scale=[0.8, 1.0], ratio=[0.9, 1.1]),
        random_brightness=[0.1],
        random_contrast=[0.9, 1.1],
        random_saturation=[0.9, 1.1],
        random_hue=[0.05],
        augment_order=[
            "random_resized_crop", "random_brightness", "random_contrast",
            "random_saturation", "random_hue",
        ],
    )
    out = np.asarray(preprocess.augment_image(jnp.asarray(img), rng, **kwargs))
    assert out.shape == img.shape and out.dtype == np.uint8
    # different seeds -> different outputs
    out2 = np.asarray(
        preprocess.augment_image(jnp.asarray(img), jax.random.PRNGKey(1),
                                 **kwargs)
    )
    assert (out != out2).any()


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    rgb = rng.rand(16, 16, 3).astype(np.float32)
    hsv = preprocess._rgb_to_hsv(jnp.asarray(rgb))
    back = preprocess._hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-4)


def test_fused_resize_augment_batched():
    imgs = np.random.RandomState(0).randint(
        0, 255, (4, 48, 48, 3)
    ).astype(np.uint8)
    out = preprocess.fused_resize_augment(
        jnp.asarray(imgs),
        jax.random.PRNGKey(0),
        resize_size=(32, 32),
        augment_kwargs=dict(
            random_brightness=[0.2], augment_order=["random_brightness"]
        ),
        train=True,
    )
    out = np.asarray(out)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8
    # per-image rngs differ
    assert (out[0] != out[1]).any()


def test_rtx_pad_crop_shape():
    img = np.random.RandomState(0).randint(0, 255, (256, 320, 3)).astype(
        np.uint8
    )
    out = preprocess.rtx_pad_crop(jnp.asarray(img), jax.random.PRNGKey(0))
    assert np.asarray(out).shape == (256, 320, 3)
