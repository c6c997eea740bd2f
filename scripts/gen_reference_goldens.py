"""Generate bit-match parity goldens by RUNNING the reference model.

The reference (mounted read-only at /root/reference) is itself JAX/Flax;
with small API shims it executes on CPU. For each case below we build its
HyperVLA on a tiny config + fixed batch and export its hypernet params,
generated base params, and sampled actions into
tests/goldens/reference_parity/<case>/. The test suite loads those params
into THIS framework and must reproduce the actions within 1e-5
(BASELINE.json north star).

Cases cover the hypernet's main conditioning/generation modes that don't
need pretrained encoder weights (no egress here): plain block generation,
initial-image conditioning (+scaled context embeddings), shared transformer
output heads, and the continuous action head.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# shared shims (distrax/dlimp/KeyArray/process_allgather + zero-egress HF
# constructors); the tiny DINO config matches our "dinov2-test" twin
from scripts import reference_shims  # noqa: E402

reference_shims.install(
    dino_hidden=32, dino_layers=2, dino_heads=2, dino_image_size=224
)

import flax  # noqa: E402
import flax.serialization  # noqa: E402

from hypervla.model import HyperVLA as RefHyperVLA  # noqa: E402

from helpers import make_example_batch  # noqa: E402

from hypervla_tpu.configs import tiny_test_config  # noqa: E402

CASES = {
    # bias-init protocol: at step 0 the generated net must equal a fresh
    # base-net init regardless of the task (zero fan-out kernels)
    "base": dict(config_kwargs={}, batch_kwargs={}, perturb=False),
    # perturbed fan-out kernels -> generation is context-DEPENDENT, which
    # exercises the context encoder, attention-mask construction, and the
    # packed fan-out math end to end
    "perturbed": dict(config_kwargs={}, batch_kwargs={}, perturb=True),
    "initial_image": dict(
        config_kwargs=dict(
            hypernet_kwargs=dict(
                use_initial_image=True, scale_context_embedding=True
            )
        ),
        batch_kwargs=dict(
            initial_image=True, initial_patch_tokens=17, initial_patch_dim=32
        ),
        perturb=True,
    ),
    # NOTE: the reference forwards action_head_kwargs verbatim to
    # ContinuousActionHead, so only keys its __init__ accepts may be present.
    # the flagship topology: DINOv2 shared image encoder (tiny twin),
    # initial-image conditioning, shared layer indices
    "dinov2_shared": dict(
        config_kwargs=dict(encoder_type="DINOv2"),
        batch_kwargs=dict(
            image_size=224, initial_image=True, initial_patch_dim=32
        ),
        perturb=True,
        # drop this framework's vit_kwargs extensions the reference's ViT
        # doesn't know (it hardcodes facebook/dinov2-base etc.)
        post=lambda c: [
            c["base_net_kwargs"]["vit_kwargs"].pop(k, None)
            for k in (
                "pretrained_encoder_name", "encoder_dtype",
                "use_flash_attention", "sow_dino_attention",
                "scan_dino_layers", "flash_attention_trainable",
            )
        ],
    ),
    # NOTE: the reference forwards action_head_kwargs verbatim to
    # ContinuousActionHead, so only keys its __init__ accepts may be present.
    "continuous_head": dict(
        config_kwargs=dict(action_head_type="continuous"),
        batch_kwargs={},
        perturb=True,
        post=lambda c: c["base_net_kwargs"].__setitem__(
            "action_head_kwargs",
            {
                k: v
                for k, v in c["base_net_kwargs"]["action_head_kwargs"].items()
                if k in (
                    "max_action", "loss_type", "token_per_horizon",
                    "squash_continuous_action", "tanh_scaling_factor",
                    "clip_target",
                )
            },
        ),
    ),
}


def _perturb_fanout(params, scale=0.02):
    """Randomizes the output-head kernels (fixed seed) so generated weights
    depend on the context; biases keep the init-protocol values."""
    rng = np.random.RandomState(123)
    out = {}
    for k, v in params.items():
        if k.startswith("output_head_") and isinstance(v, dict) and "kernel" in v:
            v = dict(v)
            v["kernel"] = (
                scale * rng.randn(*np.shape(v["kernel"]))
            ).astype(np.float32)
        out[k] = v
    return out


def run_case(name, config_kwargs, batch_kwargs, perturb, post=None):
    # the reference keeps raw arrays in jit-static dataclass fields, which
    # breaks pjit cache-equality checks once a SECOND model instance exists
    # (the bug hypervla_tpu/utils/static.py fixes); fresh caches per case
    jax.clear_caches()
    config_kwargs = dict(config_kwargs)
    encoder_type = config_kwargs.pop("encoder_type", "SmallStem")
    config = tiny_test_config(encoder_type=encoder_type, **config_kwargs)
    if post is not None:
        post(config)
    batch_kwargs = dict({"image_size": 64}, **batch_kwargs)
    batch = make_example_batch(batch_size=2, **batch_kwargs)
    model = RefHyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    if perturb:
        model = model.replace(
            params=_perturb_fanout(flax.core.unfreeze(model.params))
        )

    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {"language_instruction": example["task"]["language_instruction"]}
    initial_state = example.get("initial_state") if batch_kwargs else None
    if not config["hypernet_kwargs"].get("use_initial_image", False):
        initial_state = None
    base_params, tasks, _ = model.create_tasks(
        instruction_dict=instr, initial_state=initial_state
    )
    action, _ = model.sample_actions(
        example["observation"]["image_primary"],
        instr,
        tasks,
        example["observation"]["timestep_pad_mask"],
        base_params,
        rng=jax.random.PRNGKey(7),
    )
    action = np.asarray(action)
    print(f"{name}: action {action.shape} {action.ravel()[:3]}", flush=True)

    out_dir = os.path.join(REPO, "tests/goldens/reference_parity", name)
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/hypernet_params.msgpack", "wb") as f:
        f.write(
            flax.serialization.msgpack_serialize(
                jax.device_get(flax.core.unfreeze(model.params))
            )
        )
    with open(f"{out_dir}/generated_base_params.msgpack", "wb") as f:
        f.write(
            flax.serialization.msgpack_serialize(
                jax.device_get(flax.core.unfreeze(base_params))
            )
        )
    io = dict(
        action=action,
        image=example["observation"]["image_primary"],
        pad_mask=example["observation"]["timestep_pad_mask"],
        input_ids=instr["language_instruction"]["input_ids"],
        attention_mask=instr["language_instruction"]["attention_mask"],
        token_embedding=instr["language_instruction"]["token_embedding"],
    )
    if initial_state is not None:
        io["initial_image"] = initial_state["image_primary"]
        io["initial_patch_embeddings"] = initial_state["patch_embeddings"]
    np.savez(f"{out_dir}/io.npz", **io)


if __name__ == "__main__":
    for name, case in CASES.items():
        run_case(name, **case)
    print("goldens written")
