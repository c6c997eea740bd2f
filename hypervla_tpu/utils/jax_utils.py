"""JAX runtime utilities (parity: octo/utils/jax_utils.py).

Persistent compilation cache (first compile of the flagship stack is tens of
seconds; subsequent processes hit the cache), multihost array helpers, and
string broadcast.
"""
import logging
import os

import jax
import numpy as np


def initialize_compilation_cache(
    cache_dir: str = os.path.expanduser("~/.jax_compilation_cache"),
):
    """Enables the persistent XLA compilation cache."""
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older/newer jax flag names
        logging.warning(f"compilation cache unavailable: {e}")


def fast_device_get(tree):
    """Device -> host transfer of a pytree as ONE packed buffer per dtype.

    Leaf-by-leaf `np.asarray`/`jax.device_get` pays a host round trip per
    leaf — measured ~80 s for the flagship base net's 296 leaves (347 MB)
    through the shared-chip tunnel vs ~10 s packed. Leaves already on the
    host pass through untouched.
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [None] * len(leaves)
    groups = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            groups.setdefault(jnp.result_type(leaf), []).append(i)
        else:
            out[i] = np.asarray(leaf)
    for dt, idxs in groups.items():
        if len(idxs) == 1:
            out[idxs[0]] = np.asarray(leaves[idxs[0]])
            continue
        packed = jax.jit(
            lambda ls: jnp.concatenate([jnp.ravel(x) for x in ls])
        )([leaves[i] for i in idxs])
        host = np.asarray(packed)
        offset = 0
        for i in idxs:
            size = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = host[offset:offset + size].reshape(leaves[i].shape)
            offset += size
    return jax.tree_util.tree_unflatten(treedef, out)


def host_broadcast_str(x: str) -> str:
    """Broadcasts a string from host 0 to all hosts."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    multihost_utils.assert_equal(
        jax.process_index() is not None, "process index defined"
    )
    encoded = np.array([ord(c) for c in x.ljust(4096)[:4096]], dtype=np.uint8)
    encoded = multihost_utils.broadcast_one_to_all(encoded)
    return "".join(chr(u) for u in encoded).rstrip()


def shard_along_axis(x, devices, axis: int = 0):
    """Shards a host array along an axis across devices (global array)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(devices), ("x",))
    spec = [None] * x.ndim
    spec[axis] = "x"
    return jax.device_put(x, NamedSharding(mesh, PartitionSpec(*spec)))


def merge_along_axis(x, axis: int = 0):
    """Host-local -> global array across processes along an axis."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    return multihost_utils.host_local_array_to_global_array(
        x, _global_mesh(), PartitionSpec("x")
    )


def split_along_axis(x, axis: int = 0):
    """Global array -> host-local along an axis."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    return multihost_utils.global_array_to_host_local_array(
        x, _global_mesh(), PartitionSpec("x")
    )


def _global_mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("x",))


def replicate(pytree):
    """Replicates a pytree onto all local devices (fully-replicated global
    arrays — the GSPMD analogue of flax replicate)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()), ("x",))
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.device_put(pytree, sharding)
