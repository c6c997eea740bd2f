from hypervla_tpu.configs.defaults import (
    flagship_pretrain_config,
    pretrain_config,
    tiny_test_config,
)
