"""Reference-checkpoint conversion.

The reference implementation (MasterXiong/Hyper-VLA) is also JAX/Flax, and
this framework keeps its parameter-tree layout except where modules were
re-designed:

  * flax's `MultiHeadDotProductAttention_N` is our `MultiHeadAttention_N`
    (models/attention.py) — a pure rename, applied everywhere including the
    flattened output-head keys;
  * the MLP-ResNet diffusion score network (models/diffusion.py) merges the
    reference's time_preprocess/cond_encoder into one `time_encoder` and
    stacks its residual blocks with nn.scan under `trunk/blocks`;
  * the 1-D conditional U-Net (models/unet.py) names its stages
    (encoder_i_j / bottleneck_i / decoder_i_j / downsamplers_i /
    upsamplers_i / time_mlp_i / out_proj) instead of flax call-order
    auto-names.

`convert_reference_params` remaps whole reference param trees (the basis of
the bit-match parity goldens in tests/goldens/reference_parity/), including
the diffusion/U-Net head layouts above.
"""
import re
from typing import Any, Dict

import numpy as np

_REF_TOKEN = "MultiHeadDotProductAttention_"
_OUR_TOKEN = "MultiHeadAttention_"


def _rename(name: str, src: str, dst: str) -> str:
    return name.replace(src, dst)


def _remap_tree(tree: Any, src: str, dst: str) -> Any:
    if isinstance(tree, dict):
        return {
            _rename(k, src, dst): _remap_tree(v, src, dst)
            for k, v in tree.items()
        }
    return tree


# ---------------------------------------------------------------------------
# MLP-ResNet diffusion score network (reference octo/model/components/
# diffusion.py ScoreActor -> models/diffusion.py ScoreActor)
# ---------------------------------------------------------------------------

def _is_ref_score_actor(tree: Dict) -> bool:
    return (
        isinstance(tree, dict)
        and "time_preprocess" in tree
        and "reverse_network" in tree
    )


def _convert_score_actor(ref: Dict) -> Dict:
    reverse = ref["reverse_network"]
    block_names = sorted(
        (k for k in reverse if k.startswith("MLPResNetBlock_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )

    def stacked(sub_path):
        """Stacks one leaf across the per-block subtrees on a new axis 0."""
        leaves = []
        for name in block_names:
            node = reverse[name]
            for part in sub_path[:-1]:
                node = node[part]
            leaves.append(np.asarray(node[sub_path[-1]]))
        return np.stack(leaves)

    blocks: Dict = {}
    template = reverse[block_names[0]]
    for mod, sub in template.items():
        blocks[mod] = {leaf: stacked((mod, leaf)) for leaf in sub}

    time_encoder = dict(ref["time_preprocess"])
    for k, v in ref.get("cond_encoder", {}).items():
        time_encoder[k] = v

    trunk = {"blocks": blocks}
    for k, v in reverse.items():
        if not k.startswith("MLPResNetBlock_"):
            trunk[k] = v  # Dense_0 (in-proj), Dense_1 (output head)
    return {"time_encoder": time_encoder, "trunk": trunk}


# ---------------------------------------------------------------------------
# 1-D conditional U-Net (reference octo/model/components/unet.py
# ConditionalUnet1D -> models/unet.py ConditionalUnet1D)
# ---------------------------------------------------------------------------

def _is_ref_unet(tree: Dict) -> bool:
    return isinstance(tree, dict) and any(
        k.startswith("ConditionalResidualBlock1D_") for k in tree
    )


def _convert_film_block(ref_block: Dict) -> Dict:
    out = {}
    for k, v in ref_block.items():
        k = k.replace("Conv1dBlock_", "ConvNormAct1D_")
        out[k] = v  # Dense_0 (FiLM) and Conv_0 (residual proj) keep names
    return out


def _convert_unet(ref: Dict) -> Dict:
    n_down = sum(1 for k in ref if k.startswith("Downsample1d_"))
    levels = n_down + 1
    res_names = sorted(
        (k for k in ref if k.startswith("ConditionalResidualBlock1D_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    mid_layers = len(res_names) - 2 * levels - 2 * (levels - 1)
    assert mid_layers >= 0, "unexpected U-Net block count"

    res = iter(res_names)
    out: Dict = {}
    # encoder: two blocks per level, reference call order is level 0..L-1
    for level in range(levels):
        for j in range(2):
            out[f"encoder_{level}_{j}"] = _convert_film_block(
                ref[next(res)]
            )
    for i in range(mid_layers):
        out[f"bottleneck_{i}"] = _convert_film_block(ref[next(res)])
    # decoder: reference walks levels L-2..0
    for level in range(levels - 2, -1, -1):
        for j in range(2):
            out[f"decoder_{level}_{j}"] = _convert_film_block(
                ref[next(res)]
            )
    # reference creates Upsample1d_i in decoder order (level L-2 first);
    # ours are indexed by level
    for i, level in enumerate(range(levels - 2, -1, -1)):
        out[f"upsamplers_{level}"] = ref[f"Upsample1d_{i}"]["ConvTranspose_0"]
    for i in range(n_down):
        out[f"downsamplers_{i}"] = ref[f"Downsample1d_{i}"]["Conv_0"]
    out["time_mlp_0"] = ref["Dense_0"]
    out["time_mlp_1"] = ref["Dense_1"]
    # the final Conv1dBlock at the unet level
    final = [k for k in ref if re.fullmatch(r"Conv1dBlock_\d+", k)]
    assert len(final) == 1, f"expected one output Conv1dBlock, got {final}"
    out["out_proj"] = ref[final[0]]
    return out


def _convert_structures(tree: Any) -> Any:
    if not isinstance(tree, dict):
        return tree
    if _is_ref_score_actor(tree):
        return _convert_score_actor(tree)
    if _is_ref_unet(tree):
        return _convert_unet(tree)
    return {k: _convert_structures(v) for k, v in tree.items()}


def convert_reference_params(params: Dict) -> Dict:
    """Reference param tree -> this framework's layout."""
    return _convert_structures(
        _remap_tree(params, _REF_TOKEN, _OUR_TOKEN)
    )


def convert_params_to_reference(params: Dict) -> Dict:
    """This framework's param tree -> the reference layout (attention
    rename only; diffusion/U-Net head inversion is not implemented)."""
    return _remap_tree(params, _OUR_TOKEN, _REF_TOKEN)
