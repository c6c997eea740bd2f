"""Post-partitioning HLO assertions for the GSPMD training program.

"It compiled on a mesh" is weak evidence of tensor parallelism: XLA could
legally all-gather every sharded parameter and run the math replicated. These
checks read the SPMD-partitioned module text (per-device local shapes) and
assert the sharding actually took effect:

  * the largest 2-D hypernet parameter (a packed fan-out head kernel,
    hypernetwork.py:302-327 — the natural TP target per parallel/mesh.py)
    appears at its model/fsdp-sharded LOCAL shape and never at its full
    global shape, proving the generation matmul is partitioned, not gathered;
  * cross-device collectives (all-reduce for the model-axis contraction
    partials and the data-axis gradient sum) are present.

Used by __graft_entry__.dryrun_multichip (driver evidence) and
tests/test_parallel.py.
"""
import numpy as np

import jax

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def largest_2d_leaf(params):
    """(global_shape, path_str) of the biggest 2-D param leaf."""
    best = None
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if hasattr(leaf, "ndim") and leaf.ndim == 2:
            size = int(np.prod(leaf.shape))
            if best is None or size > best[0]:
                best = (size, tuple(leaf.shape), jax.tree_util.keystr(path))
    assert best is not None, "no 2-D parameter leaves found"
    return best[1], best[2]


def expected_local_shape(mesh, global_shape):
    """Local (per-device) shape under parallel/mesh.py::fsdp_sharding rules."""
    from hypervla_tpu.parallel.mesh import fsdp_sharding

    leaf = jax.ShapeDtypeStruct(global_shape, np.float32)
    spec = fsdp_sharding(mesh, {"x": leaf})["x"].spec
    local = list(global_shape)
    for axis, name in enumerate(spec):
        if name is not None:
            local[axis] //= mesh.shape[name]
    return tuple(local)


def check_fanout_partitioned(compiled_text: str, mesh, params):
    """Asserts the fan-out kernel is partitioned and collectives exist.

    Returns a summary dict (collective counts + the shapes checked) for
    logging into the MULTICHIP artifact.
    """
    global_shape, path = largest_2d_leaf(params)
    local_shape = expected_local_shape(mesh, global_shape)
    assert local_shape != tuple(global_shape), (
        f"sharding rules leave {path} {global_shape} replicated on mesh "
        f"{dict(mesh.shape)} — nothing to check"
    )
    full = "[{},{}]".format(*global_shape)
    local = "[{},{}]".format(*local_shape)
    n_local = compiled_text.count(local)
    n_full = compiled_text.count(full)
    assert n_local > 0, (
        f"fan-out kernel {path}: sharded local shape {local} absent from the "
        f"partitioned module — TP did not take effect"
    )
    assert n_full == 0, (
        f"fan-out kernel {path}: full global shape {full} appears {n_full}x "
        f"in the partitioned module — XLA gathered instead of partitioning"
    )
    counts = {k: compiled_text.count(k) for k in COLLECTIVES}
    assert counts["all-reduce"] > 0, (
        "no all-reduce in the partitioned module — neither the model-axis "
        "contraction partials nor the data-axis gradient sum are present"
    )
    return {
        "fanout_leaf": path,
        "global_shape": list(global_shape),
        "local_shape": list(local_shape),
        "local_shape_count": n_local,
        "collectives": counts,
    }
