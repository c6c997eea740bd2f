"""Times the hypernet-generation first call in a FRESH process.

Run AFTER a process has already populated the AOT executable cache
(utils/aot.py) — e.g. after bench.py's cold first call — to measure what a
warm robot start actually pays for `create_tasks`: deserialization + one
device execution, no trace/lower/compile.

Prints one JSON line: {"hypernet_gen_first_call_s": N, "aot_dir": ...}.
Reference anchor for the per-episode flow this probes:
/root/reference/data/utils/hypervla_interface.py:112-163 (reset -> create_tasks).
"""
import json
import time


def main():
    import jax
    import numpy as np

    from hypervla_tpu.flagship import build_flagship
    from hypervla_tpu.utils.aot import aot_cache_dir
    from hypervla_tpu.utils.jax_utils import initialize_compilation_cache

    initialize_compilation_cache()

    t0 = time.perf_counter()
    model, batch = build_flagship(encoder_dtype="bfloat16", serving=True)
    build_s = time.perf_counter() - t0
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instruction_dict = {
        "language_instruction": example["task"]["language_instruction"]
    }

    # one-time hypernet weight upload (the 345 MB device_put a fresh
    # process pays exactly once; a local PCIe-attached chip pays ~30 ms,
    # the shared-chip tunnel here several seconds)
    t0 = time.perf_counter()
    dev_params = jax.device_put(model.params)
    jax.block_until_ready(jax.tree_util.tree_leaves(dev_params))
    upload_s = time.perf_counter() - t0
    object.__setattr__(model, "_params_on_device", (model.params, dev_params))

    t0 = time.perf_counter()
    base_params, _, _ = model.create_tasks(
        instruction_dict=instruction_dict,
        initial_state=example["initial_state"],
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(base_params)[0])
    elapsed = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "hypernet_gen_first_call_s": round(elapsed, 3),
                "param_upload_s": round(upload_s, 3),
                "model_build_s": round(build_s, 3),
                "aot_dir": str(aot_cache_dir()),
            }
        )
    )


if __name__ == "__main__":
    main()
