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

def bench(fn, args, n=200):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1000

@jax.jit
def full_step(bp, images, tok, pm, rng):
    return model.base_net.apply({"params": bp}, images.squeeze(1), tok, pm,
        rng=rng, rngs={"dropout": rng}, train=False, method=BaseNetwork.predict_action)
print("full step:", bench(full_step, (base_params, images, tok, pm, rng)), "ms", flush=True)

# encoder-only (ViT encode incl. DINO) to isolate the action head
@jax.jit
def encode_only(bp, images, tok):
    return model.base_net.apply({"params": bp}, images.squeeze(1), tok,
        train=False, method=BaseNetwork.encode)[0]["readout_action"].tokens
print("encode only:", bench(encode_only, (base_params, images, tok)), "ms", flush=True)

# dino-subtree-only forward using the same param values
from hypervla_tpu.models.encoders.dinov2 import DINOv2Model, dinov2_config
dino = DINOv2Model(config=dinov2_config("dinov2-base"), dtype=jnp.bfloat16)
dp = {"params": base_params["encoder"]["image_encoder"]}
x = jnp.zeros((1,224,224,3), jnp.float32)
@jax.jit
def dino_fwd(p, x):
    return dino.apply(p, x).last_hidden_state
print("dino only:", bench(dino_fwd, (dp, x)), "ms", flush=True)
