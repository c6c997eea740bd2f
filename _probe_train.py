# Flagship train-step throughput on the real chip (small batch).
import time, jax, numpy as np
from hypervla_tpu.utils.jax_utils import initialize_compilation_cache
initialize_compilation_cache()
from hypervla_tpu.configs import flagship_pretrain_config
from hypervla_tpu.flagship import make_flagship_batch
from hypervla_tpu.models.hypervla import HyperVLA
from hypervla_tpu.train.optimizer import create_optimizer, hn_param_type_tree
from hypervla_tpu.train.train_state import TrainState
from hypervla_tpu.train.train_step import make_train_step

BS = 8
config = flagship_pretrain_config()
config["base_net_kwargs"]["vit_kwargs"]["encoder_dtype"] = "bfloat16"
batch = make_flagship_batch(batch_size=BS)
t0 = time.time()
model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
print("model built", time.time()-t0, flush=True)
tx, lr_fn, blr_fn, pn_fn = create_optimizer(model.params, hn_param_type_tree(model.params), **config["optimizer"])
state = TrainState.create(jax.random.PRNGKey(1), model.params, tx, track_ema=True)
step_fn = make_train_step(model, config, tx, lr_fn, blr_fn, pn_fn, donate=False)
t0 = time.perf_counter()
state, info = step_fn(state, batch)
jax.block_until_ready(info["training_loss"])
print(f"compile+first step: {time.perf_counter()-t0:.1f}s loss={float(info['training_loss']):.3f}", flush=True)
best = 1e9
for trial in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        state, info = step_fn(state, batch)
    jax.block_until_ready(info["training_loss"])
    best = min(best, (time.perf_counter()-t0)/5)
print(f"train step bs={BS}: {best*1000:.1f} ms -> {BS/best:.1f} samples/s", flush=True)
