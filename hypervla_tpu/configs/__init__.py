from hypervla_tpu.configs.defaults import (
    apply_fast_training_preset,
    flagship_pretrain_config,
    pretrain_config,
    tiny_test_config,
)
