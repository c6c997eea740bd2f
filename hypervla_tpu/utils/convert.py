"""Reference-checkpoint conversion.

The reference implementation (MasterXiong/Hyper-VLA) is also JAX/Flax, and
this framework keeps its parameter-tree layout except for one module name:
flax's `MultiHeadDotProductAttention_N` is our `MultiHeadAttention_N`
(models/attention.py). These helpers remap whole param trees (including the
flattened-name output-head keys like
`output_head_encoder_Transformer_0_..._MultiHeadDotProductAttention_0_...`),
so reference checkpoints load directly — the basis of the bit-match parity
goldens in tests/goldens/reference_parity/.
"""
from typing import Any, Dict

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


def convert_reference_params(params: Dict) -> Dict:
    """Reference param tree -> this framework's layout."""
    return _remap_tree(params, _REF_TOKEN, _OUR_TOKEN)


def convert_params_to_reference(params: Dict) -> Dict:
    """This framework's param tree -> the reference layout."""
    return _remap_tree(params, _OUR_TOKEN, _REF_TOKEN)
