"""Fused, batched image preprocessing in JAX (device-side).

TPU-native replacement for the reference's per-frame tf.image/dlimp frame
transforms (octo/data/obs_transforms.py + dlimp): the whole
resize -> augment -> normalize chain runs as ONE jitted XLA program over the
batch, overlapped with the training step, instead of TF C++ threads on the
host. Augmentation parity with dlimp's augment_image:

  random_resized_crop(scale, ratio)  - area/aspect sampled crop, resized back
  random_brightness([max_delta])     - additive delta in [-d, d]
  random_contrast([lo, hi])          - scale around the per-image mean
  random_saturation([lo, hi])        - scale around the per-pixel gray value
  random_hue([max_delta])            - hue rotation in HSV space

All ops consume/produce float32 images in [0, 1]; `augment_image` accepts
uint8 and returns uint8 like dlimp.
"""
import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_image(image: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Lanczos3 resize to `size` (the reference uses dlimp's tf lanczos3
    with antialiasing; jax.image.resize lanczos3 matches within fp tolerance).
    Accepts (..., H, W, C); returns uint8."""
    if image.shape[-3:-1] == tuple(size):
        return image.astype(jnp.uint8)
    x = image.astype(jnp.float32)
    out_shape = (*image.shape[:-3], *size, image.shape[-1])
    x = jax.image.resize(x, out_shape, method="lanczos3", antialias=True)
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def resize_depth_image(depth: jax.Array, size: Tuple[int, int]) -> jax.Array:
    if depth.shape[-2:] == tuple(size):
        return depth.astype(jnp.float32)
    out_shape = (*depth.shape[:-2], *size)
    return jax.image.resize(
        depth.astype(jnp.float32), out_shape, method="lanczos3", antialias=True
    )


# ----------------------------- color utilities -----------------------------


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


# ------------------------------ augmentations ------------------------------


def random_resized_crop(image, rng, scale, ratio):
    """Samples area in `scale` and aspect in `ratio`, crops, resizes back.
    image: (H, W, C) float32 [0,1]."""
    h, w = image.shape[-3], image.shape[-2]
    rng_area, rng_ratio, rng_x, rng_y = jax.random.split(rng, 4)
    area_frac = jax.random.uniform(rng_area, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        rng_ratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    target_area = area_frac * h * w
    cut_h = jnp.sqrt(target_area / aspect)
    cut_w = jnp.sqrt(target_area * aspect)
    cut_h = jnp.clip(cut_h, 1.0, h).astype(jnp.float32)
    cut_w = jnp.clip(cut_w, 1.0, w).astype(jnp.float32)
    off_y = jax.random.uniform(rng_y, (), minval=0.0, maxval=1.0) * (h - cut_h)
    off_x = jax.random.uniform(rng_x, (), minval=0.0, maxval=1.0) * (w - cut_w)

    # crop + resize via scale_and_translate (shapes stay static)
    scale_y = h / cut_h
    scale_x = w / cut_w
    out = jax.image.scale_and_translate(
        image,
        shape=image.shape,
        spatial_dims=(image.ndim - 3, image.ndim - 2),
        scale=jnp.array([scale_y, scale_x]),
        translation=jnp.array([-off_y * scale_y, -off_x * scale_x]),
        method="bilinear",
        antialias=True,
    )
    return jnp.clip(out, 0.0, 1.0)


def random_brightness(image, rng, max_delta):
    delta = jax.random.uniform(rng, (), minval=-max_delta, maxval=max_delta)
    return jnp.clip(image + delta, 0.0, 1.0)


def random_contrast(image, rng, lower, upper):
    factor = jax.random.uniform(rng, (), minval=lower, maxval=upper)
    mean = jnp.mean(image, axis=(-3, -2, -1), keepdims=True)
    return jnp.clip((image - mean) * factor + mean, 0.0, 1.0)


def random_saturation(image, rng, lower, upper):
    factor = jax.random.uniform(rng, (), minval=lower, maxval=upper)
    gray = jnp.mean(image, axis=-1, keepdims=True)
    return jnp.clip(gray + (image - gray) * factor, 0.0, 1.0)


def random_hue(image, rng, max_delta):
    delta = jax.random.uniform(rng, (), minval=-max_delta, maxval=max_delta)
    hsv = _rgb_to_hsv(image)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)


_AUGMENT_OPS = {
    "random_resized_crop": lambda img, rng, kw: random_resized_crop(
        img, rng, kw["scale"], kw["ratio"]
    ),
    "random_brightness": lambda img, rng, kw: random_brightness(img, rng, kw[0]),
    "random_contrast": lambda img, rng, kw: random_contrast(
        img, rng, kw[0], kw[1]
    ),
    "random_saturation": lambda img, rng, kw: random_saturation(
        img, rng, kw[0], kw[1]
    ),
    "random_hue": lambda img, rng, kw: random_hue(img, rng, kw[0]),
}


def augment_image(image, rng, augment_order: Sequence[str], **kwargs):
    """Applies augmentations in order. image: (H, W, C) uint8 or float."""
    was_uint8 = image.dtype == jnp.uint8
    x = image.astype(jnp.float32)
    if was_uint8:
        x = x / 255.0
    rngs = jax.random.split(rng, len(augment_order))
    for op_name, op_rng in zip(augment_order, rngs):
        x = _AUGMENT_OPS[op_name](x, op_rng, kwargs[op_name])
    if was_uint8:
        x = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
    return x


@functools.lru_cache(maxsize=None)
def _augment_image_jit(kwargs_json: str, backend: str):
    import json

    kwargs = json.loads(kwargs_json)

    def fn(image, rng):
        return augment_image(image, rng, **kwargs)

    return jax.jit(fn, backend=backend)


@functools.lru_cache(maxsize=None)
def _resize_image_jit(size, backend):
    return jax.jit(lambda img: resize_image(img, size), backend=backend)


def resize_image_host(image, size):
    """Host-pipeline variant of `resize_image`: cached jitted CPU program per
    (target size, image shape) — one dispatch per frame."""
    if image.shape[-3:-1] == tuple(size):
        return np.asarray(image, dtype=np.uint8)
    try:
        fn = _resize_image_jit(tuple(size), "cpu")
    except RuntimeError:
        return resize_image(image, size)
    return fn(image)


def augment_image_host(image, rng, **kwargs):
    """Host-pipeline variant of `augment_image`: one cached jitted CPU program
    per (augment config, image shape) instead of ~20 op-by-op dispatches per
    frame (which, on a TPU host, can even round-trip the accelerator)."""
    import json

    key = json.dumps(kwargs, sort_keys=True, default=list)
    try:
        fn = _augment_image_jit(key, "cpu")
    except RuntimeError:  # no CPU backend registered
        return augment_image(image, rng, **kwargs)
    return fn(image, rng)


def rtx_pad_crop(image, rng):
    """The "rtx" style crop (obs_transforms.py:186-208): pad a 256x320 frame
    by (20, 50), then randomly crop back to 256x320."""
    ud_pad, lr_pad = 20, 50
    h, w = 256, 320
    padded = jnp.pad(
        image, [(ud_pad, ud_pad), (lr_pad, lr_pad), (0, 0)]
    )
    rng_y, rng_x = jax.random.split(rng)
    off_y = jax.random.randint(rng_y, (), 0, 2 * ud_pad + 1)
    off_x = jax.random.randint(rng_x, (), 0, 2 * lr_pad + 1)
    return jax.lax.dynamic_slice(
        padded, (off_y, off_x, 0), (h, w, image.shape[-1])
    )


@functools.partial(jax.jit, static_argnames=("resize_size", "augment_kwargs_static", "train"))
def _fused_batch(images, rng, resize_size, augment_kwargs_static, train):
    import json

    augment_kwargs = (
        json.loads(augment_kwargs_static) if augment_kwargs_static else None
    )

    def per_image(img, r):
        img = resize_image(img, resize_size)
        if train and augment_kwargs:
            img = augment_image(img, r, **augment_kwargs)
        return img

    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(per_image)(images, rngs)


def fused_resize_augment(
    images, rng, resize_size: Tuple[int, int], augment_kwargs: Dict = None,
    train: bool = True,
):
    """One XLA program: batched lanczos3 resize + augmentation chain.
    images: (B, H, W, C) uint8."""
    import json

    static = json.dumps(augment_kwargs, sort_keys=True) if augment_kwargs else ""
    return _fused_batch(images, rng, tuple(resize_size), static, train)
