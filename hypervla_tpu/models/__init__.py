from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.models.transformer import (
    AddPositionEmbs,
    Encoder1DBlock,
    MAPHead,
    MlpBlock,
    Transformer,
    common_transformer_sizes,
)
