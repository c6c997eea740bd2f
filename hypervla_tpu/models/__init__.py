from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.models.transformer import (
    AddPositionEmbs,
    Encoder1DBlock,
    MAPHead,
    MlpBlock,
    Transformer,
    common_transformer_sizes,
)


def __getattr__(name):
    """Lazy re-exports of the heavyweight model facades."""
    lazy = {
        "HyperVLA": ("hypervla_tpu.models.hypervla", "HyperVLA"),
        "BaseModel": ("hypervla_tpu.models.base_model", "BaseModel"),
        "OctoModel": ("hypervla_tpu.models.octo_model", "OctoModel"),
        "BaseNetwork": ("hypervla_tpu.models.base_network", "BaseNetwork"),
        "HyperNetwork": ("hypervla_tpu.models.hypernetwork", "HyperNetwork"),
        "BlockTransformer": (
            "hypervla_tpu.models.block_transformer", "BlockTransformer"
        ),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
