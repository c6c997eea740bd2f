"""Generate bit-match parity goldens by RUNNING the reference model.

The reference (/root/reference) is itself JAX/Flax; with small API shims it
executes on CPU. We build its HyperVLA on a tiny config + fixed batch, then
export its params, generated base params, and sampled actions. The test
suite loads these goldens into OUR model and must reproduce the actions
within 1e-5 (BASELINE.json north star).
"""
import sys
import types

import numpy as np

sys.path.insert(0, "/root/repo")  # repo root (adjust when run elsewhere)

import jax

jax.config.update("jax_platforms", "cpu")

# ---- shims for the reference's older jax/missing deps ----
if not hasattr(jax.random, "KeyArray"):
    jax.random.KeyArray = jax.Array
if not hasattr(jax, "tree_map"):
    jax.tree_map = jax.tree_util.tree_map

distrax = types.ModuleType("distrax")


class _Categorical:
    def __init__(self, logits=None):
        self.logits = logits

    def mode(self):
        import jax.numpy as jnp

        return jnp.argmax(self.logits, axis=-1)

    def sample(self, seed=None, sample_shape=()):
        return jax.random.categorical(seed, self.logits)


distrax.Categorical = _Categorical
sys.modules["distrax"] = distrax

# modern process_allgather prepends a process axis even single-process;
# identity is the old single-process behavior the reference assumes
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.process_allgather = lambda tree, *a, **k: jax.tree_util.tree_map(
    np.asarray, tree
)

sys.path.insert(0, "/root/reference")

from hypervla.model import HyperVLA as RefHyperVLA  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from helpers import make_example_batch  # noqa: E402

from hypervla_tpu.configs import tiny_test_config  # noqa: E402

config = tiny_test_config(encoder_type="SmallStem")
batch = make_example_batch(batch_size=2, image_size=64)

model = RefHyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
print("reference model built", flush=True)

example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
instr = {"language_instruction": example["task"]["language_instruction"]}
base_params, tasks, _ = model.create_tasks(instruction_dict=instr)
action, _ = model.sample_actions(
    example["observation"]["image_primary"],
    instr,
    tasks,
    example["observation"]["timestep_pad_mask"],
    base_params,
    rng=jax.random.PRNGKey(7),
)
action = np.asarray(action)
print("reference action:", action.shape, action.ravel()[:5], flush=True)

# export: hypernet params + generated base params + action
import flax.serialization  # noqa: E402

hn_params = jax.device_get(flax.core.unfreeze(model.params))
gen_params = jax.device_get(flax.core.unfreeze(base_params))

out_dir = "/root/repo/tests/goldens/reference_parity"
import os

os.makedirs(out_dir, exist_ok=True)
with open(f"{out_dir}/hypernet_params.msgpack", "wb") as f:
    f.write(flax.serialization.msgpack_serialize(hn_params))
with open(f"{out_dir}/generated_base_params.msgpack", "wb") as f:
    f.write(flax.serialization.msgpack_serialize(gen_params))
np.savez(
    f"{out_dir}/io.npz",
    action=action,
    image=example["observation"]["image_primary"],
    pad_mask=example["observation"]["timestep_pad_mask"],
    input_ids=instr["language_instruction"]["input_ids"],
    attention_mask=instr["language_instruction"]["attention_mask"],
    token_embedding=instr["language_instruction"]["token_embedding"],
)
size = sum(
    os.path.getsize(os.path.join(out_dir, p)) for p in os.listdir(out_dir)
)
print(f"goldens written: {size/1e6:.2f} MB", flush=True)
# also print the param treedef summary for mapping
names = sorted(
    "/".join(str(k.key) for k in path)
    for path, _ in jax.tree_util.tree_flatten_with_path(hn_params)[0]
)
print("ref hypernet leaves:", len(names))
print("\n".join(names[:20]))
