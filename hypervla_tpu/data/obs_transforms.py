"""Frame-level observation transforms (parity: octo/data/obs_transforms.py).

Host side: JPEG/PNG decode (PIL). Heavy math (resize, augmentation) delegates
to the fused JAX ops in hypervla_tpu.ops.preprocess — on the host CPU backend
for the per-frame API here, or batched on the TPU inside the input pipeline's
device stage (the production path).
"""
import io
import logging
from functools import lru_cache
from typing import Mapping, Optional, Tuple, Union

import jax
import numpy as np

from hypervla_tpu.ops import preprocess


@lru_cache(maxsize=1)
def _cpu_device():
    """Host pipeline math must stay on the CPU backend — per-frame dispatch
    to a remote TPU would serialize the input pipeline."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


class _on_cpu:
    def __enter__(self):
        dev = _cpu_device()
        self._ctx = jax.default_device(dev) if dev is not None else None
        if self._ctx is not None:
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            self._ctx.__exit__(*exc)
        return False


def _as_bytes(value) -> bytes:
    """Extracts raw bytes from bytes / np.bytes_ / 0-d object arrays."""
    if isinstance(value, np.ndarray):
        if value.ndim == 0:
            value = value.item()
        else:
            value = value.reshape(-1)[0]
    if isinstance(value, str):
        return value.encode("utf-8")
    return bytes(value)


def decode_image(value, dtype=np.uint8) -> np.ndarray:
    """Decodes a serialized image (bytes) to an array; passes arrays through."""
    if isinstance(value, (bytes, np.bytes_)):
        if len(value) == 0:
            return None
        from PIL import Image

        img = Image.open(io.BytesIO(value))
        return np.asarray(img, dtype=dtype)
    return np.asarray(value)


def augment(obs: dict, seed, augment_kwargs: Union[dict, Mapping[str, dict]]) -> dict:
    """Augments each image key (skipping padding images), seeding each key
    differently like the reference (obs_transforms.py:29-42)."""
    if not hasattr(augment_kwargs, "items"):
        raise ValueError(
            "augment_kwargs must be a dict keyed by image name or a single "
            "dict with an 'augment_order' key."
        )
    image_names = {key[6:] for key in obs if key.startswith("image_")}
    if "augment_order" in augment_kwargs:
        augment_kwargs = {name: augment_kwargs for name in image_names}

    for i, name in enumerate(sorted(image_names)):
        if name not in augment_kwargs:
            continue
        kwargs = dict(augment_kwargs[name])
        if obs["pad_mask_dict"][f"image_{name}"]:
            rng = jax.random.PRNGKey(int(seed) + i)
            with _on_cpu():
                obs[f"image_{name}"] = np.asarray(
                    preprocess.augment_image_host(
                        obs[f"image_{name}"], rng, **kwargs
                    )
                )
    return obs


def image_dropout(
    obs: dict,
    seed,
    dropout_prob: float,
    always_keep_key: Optional[str] = None,
) -> dict:
    """Independently drops image keys but always keeps at least one."""
    image_keys = [key for key in obs if key.startswith("image_")]
    if not image_keys:
        return obs
    rng = np.random.default_rng(int(seed))
    pad_mask = np.stack([obs["pad_mask_dict"][key] for key in image_keys])
    if always_keep_key:
        assert always_keep_key in image_keys, (
            f"always_keep_key {always_keep_key} not in {image_keys}"
        )
        always_keep_index = image_keys.index(always_keep_key)
    else:
        nonpad = np.nonzero(pad_mask)[0]
        always_keep_index = int(rng.choice(nonpad)) if len(nonpad) else 0

    rands = rng.random(len(image_keys))
    pad_mask = pad_mask & (
        (np.arange(len(image_keys)) == always_keep_index)
        | (rands > dropout_prob)
    )
    for i, key in enumerate(image_keys):
        obs["pad_mask_dict"][key] = pad_mask[i]
        if not pad_mask[i]:
            obs[key] = np.zeros_like(obs[key])
    return obs


def decode_and_resize(
    obs: dict,
    resize_size: Union[Tuple[int, int], Mapping[str, Tuple[int, int]]],
    depth_resize_size: Union[Tuple[int, int], Mapping[str, Tuple[int, int]]],
) -> dict:
    """Decodes images/depth and resizes (lanczos3); empty strings become
    zero padding images at the target size."""
    image_names = {key[6:] for key in obs if key.startswith("image_")}
    depth_names = {key[6:] for key in obs if key.startswith("depth_")}
    if isinstance(resize_size, tuple):
        resize_size = {name: resize_size for name in image_names}
    if isinstance(depth_resize_size, tuple):
        depth_resize_size = {name: depth_resize_size for name in depth_names}

    for name in image_names:
        if name not in resize_size:
            logging.warning(
                f"No resize_size provided for image_{name}; 1x1 padding images."
            )
        image = obs[f"image_{name}"]
        if isinstance(image, (bytes, np.bytes_)) or (
            isinstance(image, np.ndarray) and image.dtype.kind in ("S", "O", "U")
        ):
            raw = _as_bytes(image)
            if len(raw) == 0:
                image = np.zeros(
                    (*resize_size.get(name, (1, 1)), 3), dtype=np.uint8
                )
            else:
                image = decode_image(raw)
        elif image.dtype != np.uint8:
            raise ValueError(f"Unsupported image dtype: {image.dtype}")
        if name in resize_size:
            with _on_cpu():
                image = np.asarray(
                    preprocess.resize_image_host(
                        image, tuple(resize_size[name])
                    )
                )
        obs[f"image_{name}"] = image

    for name in depth_names:
        depth = obs[f"depth_{name}"]
        if isinstance(depth, (bytes, np.bytes_)) or (
            isinstance(depth, np.ndarray) and depth.dtype.kind in ("S", "O", "U")
        ):
            depth = _as_bytes(depth)
            if len(depth) == 0:
                depth = np.zeros(
                    (*depth_resize_size.get(name, (1, 1)), 1), dtype=np.float32
                )
            else:
                depth = decode_image(depth, dtype=np.float32)[..., 0]
        elif depth.dtype != np.float32:
            raise ValueError(f"Unsupported depth dtype: {depth.dtype}")
        if name in depth_resize_size:
            with _on_cpu():
                depth = np.asarray(
                    preprocess.resize_depth_image(
                        depth, tuple(depth_resize_size[name])
                    )
                )
        obs[f"depth_{name}"] = depth
    return obs


def decode_and_crop_and_resize(
    obs: dict,
    resize_size,
    depth_resize_size,
    train: bool,
    seed: Optional[int] = None,
) -> dict:
    """The "rtx" variant: decode, pad 256x320 by (20, 50) + random crop at
    train time, then resize."""
    image_names = {key[6:] for key in obs if key.startswith("image_")}
    if isinstance(resize_size, tuple):
        resize_size = {name: resize_size for name in image_names}

    for name in image_names:
        image = obs[f"image_{name}"]
        if isinstance(image, (bytes, np.bytes_)) or (
            isinstance(image, np.ndarray) and image.dtype.kind in ("S", "O", "U")
        ):
            raw = _as_bytes(image)
            if len(raw) == 0:
                image = np.zeros(
                    (*resize_size.get(name, (1, 1)), 3), dtype=np.uint8
                )
            else:
                image = decode_image(raw)
        if train:
            rng = jax.random.PRNGKey(
                seed if seed is not None else np.random.randint(2**31)
            )
            image = np.asarray(preprocess.rtx_pad_crop(image, rng))
        if name in resize_size:
            with _on_cpu():
                image = np.asarray(
                    preprocess.resize_image_host(
                        image, tuple(resize_size[name])
                    )
                )
        obs[f"image_{name}"] = image

    return decode_and_resize(obs, {}, depth_resize_size)
