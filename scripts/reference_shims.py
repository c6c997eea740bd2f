"""Shims that let the reference codebase (/root/reference, read-only, pure
JAX/Flax) execute in this environment: no distrax, no network egress for
HuggingFace downloads, and a few jax API renames since jax 0.4.20.

Used by scripts/gen_reference_goldens.py (parity goldens) and
scripts/bench_reference.py (throughput denominator for the >=2x north star).
Patching from_pretrained keeps the exact model CONFIG (so FLOPs/shapes match
the real thing) with random init — the reference itself re-initializes or
only needs configs in the code paths we execute.
"""
import sys
import types

import numpy as np


def install(dino_hidden=768, dino_layers=12, dino_heads=12,
            dino_image_size=518):
    """Installs all shims. Call BEFORE importing anything from /root/reference.

    dino_* default to the real facebook/dinov2-base architecture
    (/root/reference/hypervla/model.py:543 hardcodes that name); pass smaller
    values for tiny topological twins.
    """
    import jax

    if not hasattr(jax.random, "KeyArray"):
        jax.random.KeyArray = jax.Array
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree_util.tree_map

    # ---- distrax (only Categorical is reached by the reference heads) ----
    if "distrax" not in sys.modules:
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

    # dlimp is only reached by the reference's tf.data pipeline functions,
    # which we never call; an empty module satisfies the import.
    if "dlimp" not in sys.modules:
        dlimp = types.ModuleType("dlimp")
        dlimp.DLataset = type("DLataset", (), {})  # annotation-only use
        dlimp.transforms = types.ModuleType("dlimp.transforms")
        sys.modules["dlimp"] = dlimp

    # modern process_allgather prepends a process axis even single-process;
    # identity is the old single-process behavior the reference assumes
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather = (
        lambda tree, *a, **k: jax.tree_util.tree_map(np.asarray, tree)
    )

    # ---- HuggingFace: zero-egress construction at the pinned configs ----
    import transformers

    # the REAL facebook/dinov2-base was trained at 518x518 (position table
    # of 1369 patches + cls, interpolated at runtime for other resolutions)
    dino_config = transformers.Dinov2Config(
        hidden_size=dino_hidden,
        num_hidden_layers=dino_layers,
        num_attention_heads=dino_heads,
        mlp_ratio=4,
        patch_size=14,
        image_size=dino_image_size,
        layerscale_value=1.0,
    )
    transformers.FlaxDinov2Model.from_pretrained = classmethod(
        lambda cls, *a, **k: cls(dino_config, seed=0)
    )

    # t5-base architecture (the reference hardcodes "t5-base",
    # /root/reference/scripts/train.py:169)
    _t5_config = transformers.T5Config(
        d_model=768,
        d_kv=64,
        d_ff=3072,
        num_layers=12,
        num_heads=12,
        vocab_size=32128,
    )

    def _auto_config(name, *a, **k):
        assert "t5" in name, f"unexpected AutoConfig.from_pretrained({name})"
        return _t5_config

    transformers.AutoConfig.from_pretrained = staticmethod(_auto_config)
    transformers.FlaxT5EncoderModel.from_pretrained = classmethod(
        lambda cls, name, config=None, *a, **k: cls(
            config or _t5_config, seed=0
        )
    )

    sys.path.insert(0, "/root/reference")
