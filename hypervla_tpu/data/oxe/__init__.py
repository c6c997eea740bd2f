from hypervla_tpu.data.oxe.registry import (
    make_oxe_dataset_kwargs,
    make_oxe_dataset_kwargs_and_weights,
)
