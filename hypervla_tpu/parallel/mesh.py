"""Mesh construction + sharding rules (GSPMD, the TPU-native replacement for
the reference's pmap/replicate data parallelism, SURVEY.md §5.8).

The training program is a single jit over a device mesh:
  * axis "data"  — batch (DP) over ICI within a slice, DCN across slices;
  * axis "fsdp"  — optional parameter/optimizer sharding for large configs
    (the flagship HN is ~100M params with the shared DINOv2 blocks, which
    fits replicated; fsdp=1 by default but the code paths keep it general);
  * axis "model" — optional tensor parallelism: a SECOND param axis is
    sharded (the hypernet's packed fan-out kernels are 128 x ~200k — the
    natural TP target), so the generation matmul and its gradients split
    across "model" and XLA inserts the reduce-scatters/all-gathers.

Batches are sharded along "data" (replicated over the other axes); the
TrainState is replicated or sharded along "fsdp"/"model". XLA inserts the
collectives from these annotations alone.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    fsdp: int = 1,
    tp: int = 1,
    dcn_data: Optional[int] = None,
) -> Mesh:
    """Builds a ("data", "fsdp"[, "model"]) mesh over the available devices.

    dcn_data: number of slices when running multi-slice (data-parallel over
    DCN); uses hybrid mesh construction so DP rides DCN and fsdp/model ride
    ICI. tp adds a "model" (tensor-parallel) axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % (fsdp * tp) == 0, (
        f"{n} devices not divisible by fsdp={fsdp} * tp={tp}"
    )
    data = n // (fsdp * tp)
    shape = (data, fsdp) + ((tp,) if tp > 1 else ())
    axes = ("data", "fsdp") + (("model",) if tp > 1 else ())
    if dcn_data and dcn_data > 1:
        per_slice_shape = (data // dcn_data,) + shape[1:]
        try:
            mesh_devices = mesh_utils.create_hybrid_device_mesh(
                per_slice_shape,
                dcn_mesh_shape=(dcn_data,) + (1,) * (len(shape) - 1),
                devices=devices,
            )
        except ValueError:
            # virtual/CPU devices carry no slice_index attribute: emulate the
            # slice grouping with contiguous device blocks. The LOGICAL mesh
            # (and therefore the GSPMD program and its collectives) is
            # identical; only the physical slice assignment differs, which a
            # virtual mesh does not have anyway.
            per_slice = n // dcn_data
            blocks = [
                mesh_utils.create_device_mesh(
                    per_slice_shape,
                    devices=devices[i * per_slice:(i + 1) * per_slice],
                )
                for i in range(dcn_data)
            ]
            mesh_devices = np.concatenate(blocks, axis=0)
        mesh_devices = mesh_devices.reshape(shape)
    else:
        mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(mesh_devices, axis_names=axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding along the data axis."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def fsdp_sharding(mesh: Mesh, pytree):
    """Shards the largest axis of each leaf along "fsdp" when divisible;
    when the mesh has a "model" (TP) axis, additionally shards the largest
    REMAINING axis along it. Replicates small leaves. A simple, robust
    default: the 128 x ~200k fan-out kernels end up fsdp x model sharded,
    the DINOv2 blocks fsdp-sharded, biases replicated."""
    fsdp_size = mesh.shape["fsdp"]
    tp_size = mesh.shape.get("model", 1)

    def rule(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, PartitionSpec())
        shape = leaf.shape
        spec = [None] * leaf.ndim
        order = list(np.argsort(shape)[::-1])
        if fsdp_size > 1:
            for axis in order:
                if shape[axis] % fsdp_size == 0 and shape[axis] >= 2 * fsdp_size:
                    spec[axis] = "fsdp"
                    break
        if tp_size > 1:
            for axis in order:
                if spec[axis] is None and shape[axis] % tp_size == 0 \
                        and shape[axis] >= 2 * tp_size:
                    spec[axis] = "model"
                    break
        while spec and spec[-1] is None:
            spec.pop()
        return NamedSharding(mesh, PartitionSpec(*spec))

    return jax.tree_util.tree_map(rule, pytree)


def shard_batch(batch, mesh: Mesh):
    """Places a host batch onto the mesh, sharded along "data".

    Multi-host: each process contributes its local slice of the global batch
    (jax.make_array_from_process_local_data assembles the global array)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def device_prefetch(iterator, mesh: Mesh, size: int = 2):
    """Wraps a host batch iterator so device_put overlaps with compute:
    batches are transferred to the mesh `size` steps ahead on a background
    thread (device_put is async; the queue bounds memory)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    done = object()
    error = []

    def worker():
        try:
            for batch in iterator:
                q.put(shard_batch(batch, mesh))
        except BaseException as e:
            error.append(e)
        finally:
            q.put(done)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            if error:
                raise error[0]
            return
        yield item
