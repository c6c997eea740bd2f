import time, jax, numpy as np, jax.numpy as jnp
from hypervla_tpu.utils.jax_utils import initialize_compilation_cache
initialize_compilation_cache()
from hypervla_tpu.configs import flagship_pretrain_config
from hypervla_tpu.flagship import make_flagship_batch
from hypervla_tpu.models.hypervla import HyperVLA
from hypervla_tpu.models.base_network import BaseNetwork

batch = make_flagship_batch()
example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)

def build(flash, sow):
    config = flagship_pretrain_config()
    config["base_net_kwargs"]["vit_kwargs"].update(
        encoder_dtype="bfloat16", use_flash_attention=flash,
        sow_dino_attention=sow)
    return HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))

def bench_step(model, base_params, n=200, trials=3):
    images = jax.device_put(example["observation"]["image_primary"])
    tok = jax.device_put(example["task"]["language_instruction"]["token_embedding"])
    pm = jax.device_put(example["observation"]["timestep_pad_mask"])
    rng = jax.random.PRNGKey(0)
    @jax.jit
    def step(bp, images, tok, pm, rng):
        return model.base_net.apply({"params": bp}, images.squeeze(1), tok, pm,
            rng=rng, rngs={"dropout": rng}, train=False, method=BaseNetwork.predict_action)
    out = step(base_params, images, tok, pm, rng); jax.block_until_ready(out)
    best = 1e9
    for _ in range(trials):
        t0=time.perf_counter()
        for _ in range(n): out = step(base_params, images, tok, pm, rng)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter()-t0)/n*1000)
    return best

m = build(flash=True, sow=False)
bp, _, _ = m.create_tasks(instruction_dict={"language_instruction": example["task"]["language_instruction"]}, initial_state=example["initial_state"])
bp = jax.device_put(bp)
print("flash,no-sow :", bench_step(m, bp), "ms", flush=True)

m2 = build(flash=False, sow=False)
print("xla,  no-sow :", bench_step(m2, bp), "ms", flush=True)

m3 = build(flash=False, sow=True)
print("xla,  sow    :", bench_step(m3, bp), "ms", flush=True)
