import time, jax, numpy as np, jax.numpy as jnp
from hypervla_tpu.flagship import build_flagship
from hypervla_tpu.models.base_network import BaseNetwork
model, batch = build_flagship(encoder_dtype="bfloat16")
example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
base_params, tasks, _ = model.create_tasks(instruction_dict={"language_instruction": example["task"]["language_instruction"]}, initial_state=example["initial_state"])
base_params = jax.device_put(base_params)
images = jax.device_put(example["observation"]["image_primary"])
tok = jax.device_put(example["task"]["language_instruction"]["token_embedding"])
pm = jax.device_put(example["observation"]["timestep_pad_mask"])
rng = jax.random.PRNGKey(0)
print("n leaves:", len(jax.tree_util.tree_leaves(base_params)), flush=True)

def apply_step(bp, images, tok, pm, rng):
    return model.base_net.apply({"params": bp}, images.squeeze(1), tok, pm,
        rng=rng, rngs={"dropout": rng}, train=False, method=BaseNetwork.predict_action)

step_args = jax.jit(apply_step)
step_const = jax.jit(lambda images, tok, pm, rng: apply_step(base_params, images, tok, pm, rng))

def bench(fn, args, n=200):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1000

print("params-as-args :", bench(step_args, (base_params, images, tok, pm, rng)), "ms", flush=True)
print("params-as-const:", bench(step_const, (images, tok, pm, rng)), "ms", flush=True)
