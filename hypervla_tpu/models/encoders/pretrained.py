"""Pretrained weight loading for the native encoders.

The reference downloads HF weights at model construction
(hypervla/model.py:543-589, scripts/train.py:167-194). TPU hosts in this
environment have no network egress, so loading is best-effort:

  * HYPERVLA_PRETRAINED_DIR (or ~/.cache/hypervla_tpu) is searched for
    {name}.msgpack flax param dumps;
  * the HuggingFace cache is searched for safetensors/flax checkpoints and
    converted (torch layout -> our flax layout);
  * otherwise the randomly-initialized params are kept and a warning logged —
    everything still runs, which is what tests and benchmarks need.
"""
import logging
import os
from pathlib import Path

import numpy as np

# Which encoders actually received pretrained weights in this process —
# consumed by bench.py / the flagship builder so BENCH_r*.json and logs are
# self-describing about random-vs-real weights.
LOADED_WEIGHTS = {}


def weights_mode(name: str = "dinov2") -> str:
    return "pretrained" if LOADED_WEIGHTS.get(name) else "random"


def pretrained_unavailable_reason(name: str = "dinov2-base") -> str:
    """Pins down WHY weights are random, for the bench artifact.

    The reference downloads facebook/dinov2-base at model construction
    (hypervla/model.py:543-568); this environment cannot. The returned
    string records the exact evidence: which local paths were searched
    (all empty) and the live egress error from this host, so the bench
    JSON is self-contained about the gap rather than just 'random'.
    """
    if LOADED_WEIGHTS.get(name.split("-")[0]):
        return ""
    searched = [str(Path(os.environ.get("HYPERVLA_PRETRAINED_DIR") or
                         "$HYPERVLA_PRETRAINED_DIR(unset)"))]
    searched.append(str(Path.home() / ".cache" / "hypervla_tpu"))
    hf_home = Path(os.environ.get("HF_HOME", Path.home() / ".cache" /
                                  "huggingface"))
    searched.append(str(hf_home))
    found = [d for d in searched if Path(d).is_dir()]
    import socket

    try:
        socket.setdefaulttimeout(5)
        socket.getaddrinfo("huggingface.co", 443)
        egress = "DNS for huggingface.co resolves (download not attempted)"
    except OSError as exc:
        egress = f"no egress: huggingface.co DNS fails ({exc})"
    return (
        f"no {name}.msgpack under searched dirs {searched} "
        f"(existing: {found or 'none'}); {egress}"
    )


def _candidate_dirs():
    dirs = []
    env = os.environ.get("HYPERVLA_PRETRAINED_DIR")
    if env:
        dirs.append(Path(env))
    dirs.append(Path.home() / ".cache" / "hypervla_tpu")
    return [d for d in dirs if d.is_dir()]


def _find_msgpack(name: str):
    for d in _candidate_dirs():
        p = d / f"{name}.msgpack"
        if p.exists():
            return p
    return None


def _load_msgpack(path):
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def _find_and_replace(params, key, replacement):
    """Replaces the subtree under `key` anywhere in the nested dict."""
    for k in list(params.keys()):
        if k == key:
            params[k] = replacement
            return True
        if isinstance(params[k], dict):
            if _find_and_replace(params[k], key, replacement):
                return True
    return False


def load_dinov2_weights(params, name: str = "dinov2-base") -> bool:
    """Loads pretrained DINOv2 weights into the `image_encoder` subtree of a
    base-net param dict. Returns True if weights were found and loaded."""
    path = _find_msgpack(name)
    if path is None:
        hf = _try_hf_dinov2(name)
        if hf is None:
            logging.warning(
                f"No pretrained weights for {name} found (set "
                "HYPERVLA_PRETRAINED_DIR); keeping random init."
            )
            LOADED_WEIGHTS["dinov2"] = False
            return False
        weights = hf
    else:
        weights = _load_msgpack(path)
    replaced = _find_and_replace(params, "image_encoder", weights)
    assert replaced, "param tree has no image_encoder subtree"
    logging.info(f"Loaded pretrained DINOv2 weights for {name}.")
    LOADED_WEIGHTS["dinov2"] = True
    return True


def load_clip_weights(params, name: str = "clip-vit-base-patch16") -> bool:
    path = _find_msgpack(name)
    if path is None:
        logging.warning(
            f"No pretrained weights for {name} found; keeping random init."
        )
        return False
    weights = _load_msgpack(path)
    replaced = _find_and_replace(params, "image_encoder", weights)
    assert replaced, "param tree has no image_encoder subtree"
    LOADED_WEIGHTS["clip"] = True
    return True


def load_t5_weights(name: str = "t5-base"):
    """Returns a T5 encoder param dict in our native layout, or None."""
    path = _find_msgpack(name)
    if path is None:
        hf = _try_hf_t5(name)
        if hf is not None:
            return hf
        logging.warning(
            f"No pretrained weights for {name} found; the language encoder "
            "will use random init."
        )
        return None
    return _load_msgpack(path)


def convert_hf_t5_params(hf_params):
    """HF Flax T5 encoder layout -> our native layout (t5.py).

    HF: shared/embedding, encoder/block/<i>/layer/{0,1}/..., encoder/
    final_layer_norm. Ours flattens the per-layer modules into
    block_<i>/layer_0_SelfAttention etc. (see T5EncoderModel)."""
    hf_params = _to_builtin(hf_params)
    out = {"shared_embedding": hf_params["shared"]["embedding"]}
    enc = hf_params["encoder"]
    out["final_layer_norm"] = enc["final_layer_norm"]
    for i, blk in enc["block"].items():
        b = {}
        l0 = blk["layer"]["0"]
        sa = dict(l0["SelfAttention"])
        if "relative_attention_bias" in sa:
            sa["relative_attention_bias"] = sa["relative_attention_bias"][
                "embedding"
            ]
        b["layer_0_SelfAttention"] = sa
        b["layer_0_layer_norm"] = l0["layer_norm"]
        l1 = blk["layer"]["1"]
        b["layer_1_DenseReluDense_wi"] = l1["DenseReluDense"]["wi"]
        b["layer_1_DenseReluDense_wo"] = l1["DenseReluDense"]["wo"]
        b["layer_1_layer_norm"] = l1["layer_norm"]
        out[f"block_{i}"] = b
    return out


def _try_hf_t5(name: str):
    """Best-effort conversion from a locally-cached HF flax T5 encoder."""
    try:
        from transformers import FlaxT5EncoderModel

        model = FlaxT5EncoderModel.from_pretrained(
            name, local_files_only=True
        )
        return convert_hf_t5_params(model.params)
    except Exception:
        return None


def _try_hf_dinov2(name: str):
    """Best-effort conversion from a locally-cached HF flax DINOv2 model."""
    try:
        from transformers import FlaxDinov2Model

        model = FlaxDinov2Model.from_pretrained(
            f"facebook/{name}", local_files_only=True
        )
        return _to_builtin(model.params)
    except Exception:
        return None


def _to_builtin(tree):
    if isinstance(tree, dict):
        return {k: _to_builtin(v) for k, v in tree.items()}
    return np.asarray(tree)
