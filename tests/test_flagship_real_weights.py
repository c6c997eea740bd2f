"""FULL-SIZE flagship parity against the reference, with REAL pretrained
weights — guarded: skips unless the weights are provided.

To arm this test, set HYPERVLA_PRETRAINED_DIR to a directory containing

    dinov2-base.hf.msgpack   flax msgpack of facebook/dinov2-base params in
                             HuggingFace FlaxDinov2Model layout (what
                             `FlaxDinov2Model.from_pretrained(...).params`
                             returns, dumped with
                             flax.serialization.msgpack_serialize)

On a host with egress, produce it with:

    from transformers import FlaxDinov2Model
    import flax.serialization
    m = FlaxDinov2Model.from_pretrained("facebook/dinov2-base")
    open("dinov2-base.hf.msgpack", "wb").write(
        flax.serialization.msgpack_serialize(
            flax.core.unfreeze(m.params)))

The test then:
  1. builds the REFERENCE HyperVLA (imported from /root/reference) at the
     full flagship recipe (DINOv2-base 12L/768d shared encoder, 6L/128d
     hypernet, 4L/64d policy ViT, mix head) with those weights
     (hypervla/model.py:543-568 loads them into the base net, whose flat
     blocks become hypernet shared params);
  2. perturbs the fan-out kernels so generation is context-dependent;
  3. runs create_tasks + sample_actions;
  4. loads the reference's hypernet params into THIS framework's flagship
     and requires the sampled actions to match within 1e-5 (the
     BASELINE.json north star) on the full-size model.

The T5 instruction embedding and initial-image DINO patch embeddings are
precomputed inputs shared verbatim by both models (matching the training
contract, scripts/train.py:407-419), so the comparison isolates the
hypernet + generated-base-net math at full scale with the real weights.
"""
import os

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _weights_path():
    d = os.environ.get("HYPERVLA_PRETRAINED_DIR")
    if not d:
        return None
    p = os.path.join(d, "dinov2-base.hf.msgpack")
    return p if os.path.exists(p) else None


requires_real_weights = pytest.mark.skipif(
    _weights_path() is None,
    reason="set HYPERVLA_PRETRAINED_DIR with dinov2-base.hf.msgpack "
    "(see module docstring) to run full-size real-weight parity",
)


def _perturb_fanout(params, scale=0.02):
    rng = np.random.RandomState(123)
    out = {}
    for k, v in params.items():
        if k.startswith("output_head_") and isinstance(v, dict) \
                and "kernel" in v:
            v = dict(v, kernel=(
                scale * rng.randn(*np.shape(v["kernel"]))
            ).astype(np.float32))
        out[k] = v
    return out


@requires_real_weights
def test_full_flagship_actions_match_reference_with_real_weights():
    import flax
    import flax.serialization
    import jax

    from scripts import reference_shims

    reference_shims.install()

    # point the reference's loader at the provided real weights
    import transformers

    with open(_weights_path(), "rb") as f:
        hf_params = flax.serialization.msgpack_restore(f.read())

    real_from_pretrained = transformers.FlaxDinov2Model.from_pretrained

    def from_pretrained_with_weights(cls, *a, **k):
        m = real_from_pretrained.__func__(cls, *a, **k)
        m.params = hf_params
        return m

    transformers.FlaxDinov2Model.from_pretrained = classmethod(
        from_pretrained_with_weights
    )

    from hypervla.model import HyperVLA as RefHyperVLA  # noqa: E402

    from hypervla_tpu.configs import flagship_pretrain_config
    from hypervla_tpu.flagship import make_flagship_batch
    from hypervla_tpu.models.hypervla import HyperVLA
    from hypervla_tpu.utils.convert import convert_reference_params

    config = flagship_pretrain_config()
    ref_config = jax.tree_util.tree_map(lambda x: x, config)  # deep-ish copy
    for key in ("pretrained_encoder_name", "encoder_dtype",
                "use_flash_attention", "sow_dino_attention",
                "scan_dino_layers", "fused_layer_norm", "remat_dino",
              "flash_attention_trainable"):
        ref_config["base_net_kwargs"]["vit_kwargs"].pop(key, None)

    batch = make_flagship_batch(batch_size=2)
    ref_model = RefHyperVLA.from_config(
        ref_config, batch, rng=jax.random.PRNGKey(0)
    )
    ref_model = ref_model.replace(
        params=_perturb_fanout(flax.core.unfreeze(ref_model.params))
    )

    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instr = {
        "language_instruction": example["task"]["language_instruction"]
    }
    initial_state = example["initial_state"]

    ref_base_params, ref_tasks, _ = ref_model.create_tasks(
        instruction_dict=instr, initial_state=initial_state
    )
    ref_action, _ = ref_model.sample_actions(
        example["observation"]["image_primary"],
        instr,
        ref_tasks,
        example["observation"]["timestep_pad_mask"],
        ref_base_params,
        rng=jax.random.PRNGKey(7),
    )
    ref_action = np.asarray(ref_action)

    # our full-size flagship under the reference's params
    model = HyperVLA.from_config(config, batch, jax.random.PRNGKey(0))
    ours = model.replace(
        params=convert_reference_params(
            flax.core.unfreeze(ref_model.params)
        )
    )
    base_params, tasks, _ = ours.create_tasks(
        instruction_dict=instr, initial_state=initial_state
    )
    action, _ = ours.sample_actions(
        example["observation"]["image_primary"],
        instr,
        tasks,
        example["observation"]["timestep_pad_mask"],
        base_params,
        rng=jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(
        np.asarray(action), ref_action, atol=1e-5, rtol=1e-5
    )
