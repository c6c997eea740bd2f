"""Mesh/sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    device_prefetch,
    fsdp_sharding,
    replicated,
    shard_batch,
)

pytestmark = [pytest.mark.slow, pytest.mark.dist]


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["fsdp"] == 1
    mesh2 = create_mesh(fsdp=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["fsdp"] == 2


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_fsdp_sharding_rules():
    mesh = create_mesh(fsdp=2)
    tree = {
        "big": jnp.zeros((16, 4)),   # 16 divisible by 2 -> sharded
        "tiny": jnp.zeros((3,)),     # not divisible -> replicated
        "scalar": jnp.zeros(()),
    }
    shardings = fsdp_sharding(mesh, tree)
    assert "fsdp" in str(shardings["big"].spec)
    assert shardings["tiny"].spec == replicated(mesh).spec
    # applying them works
    placed = jax.tree_util.tree_map(jax.device_put, tree, shardings)
    assert placed["big"].sharding.spec == shardings["big"].spec


def test_device_prefetch_preserves_order_and_errors():
    mesh = create_mesh()

    def gen():
        for i in range(5):
            yield {"x": np.full((8, 1), i, np.float32)}

    out = [int(np.asarray(b["x"])[0, 0]) for b in device_prefetch(gen(), mesh)]
    assert out == [0, 1, 2, 3, 4]

    def bad():
        yield {"x": np.zeros((8, 1), np.float32)}
        raise RuntimeError("source died")

    it = device_prefetch(bad(), mesh)
    next(it)
    try:
        next(it)
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_sharded_computation_reduces_over_mesh():
    mesh = create_mesh()
    x = shard_batch({"x": np.ones((8, 4), np.float32)}, mesh)["x"]

    @jax.jit
    def mean_fn(x):
        return x.mean()

    assert float(mean_fn(x)) == 1.0


def test_tp_mesh_and_sharding_rules():
    """A "model" axis shards a SECOND dimension of large 2D params."""
    import numpy as np
    from jax.sharding import PartitionSpec

    from hypervla_tpu.parallel.mesh import create_mesh, fsdp_sharding

    mesh = create_mesh(fsdp=2, tp=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "model": 2}

    tree = {
        "fanout_kernel": np.zeros((128, 2016)),  # fsdp on dim1, model on dim0
        "bias": np.zeros((7,)),                  # replicated
        "square": np.zeros((64, 64)),            # both axes shardable
    }
    shardings = fsdp_sharding(mesh, tree)
    assert shardings["fanout_kernel"].spec == PartitionSpec("model", "fsdp")
    assert shardings["bias"].spec == PartitionSpec()
    assert set(shardings["square"].spec) == {"fsdp", "model"}


def test_tp_train_step_runs(monkeypatch):
    """The driver contract, under the DRIVER'S env: the full train step
    executes on a dp=2 x fsdp=2 x model=2 mesh (same path dryrun_multichip
    takes), with the single-device loss pin and the HLO partition
    assertions — with XLA_FLAGS already pinning a (wrong) virtual device
    count in the parent env, exactly how the driver invokes the check
    (round-4: this was the one uncovered case and it broke the artifact;
    the child must REPLACE the flag, not inherit it).

    Note: the SmallStem tiny config crashes XLA's CPU SPMD partitioner under
    this 3-axis mesh (compiler abort, not a framework error); the flagship
    DINOv2-test topology partitions fine, so that is what multi-chip runs
    — and what this test exercises. The 16-device child is skipped here to
    keep the chunk under budget; the driver's dryrun run covers it."""
    import __graft_entry__ as graft

    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=4"
    )
    monkeypatch.setenv("HYPERVLA_DRYRUN_SKIP_16", "1")
    graft.dryrun_multichip(8)


def test_dryrun_child_env_replaces_device_count():
    """_child_env must REPLACE any existing device-count flag (round-4
    regression: append-if-absent left the driver's 8 in place and the
    16-device child saw 8 devices), and preserve unrelated flags."""
    import __graft_entry__ as graft

    env = graft._child_env(
        16,
        base_env={
            "XLA_FLAGS": "--xla_cpu_foo=1 "
            "--xla_force_host_platform_device_count=8",
            "JAX_PLATFORMS": "tpu",
        },
    )
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
    assert "--xla_force_host_platform_device_count=16" in env["XLA_FLAGS"]
    assert "--xla_cpu_foo=1" in env["XLA_FLAGS"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_HYPERVLA_DRYRUN_CHILD"] == "1"

    env = graft._child_env(8, base_env={})
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"


def test_dryrun_bonus_16_failure_is_nonfatal(monkeypatch, capsys):
    """A failure in the BONUS 16-device child must not fail the driver's
    n_devices contract (round-4: it returned rc=1 for the whole check)."""
    import __graft_entry__ as graft

    calls = []

    def fake_subprocess(n):
        calls.append(n)
        if n == 16:
            raise RuntimeError("boom in bonus child")

    monkeypatch.delenv("HYPERVLA_DRYRUN_SKIP_16", raising=False)
    monkeypatch.setattr(graft, "_dryrun_in_subprocess", fake_subprocess)
    graft.dryrun_multichip(8)  # must NOT raise
    assert calls == [8, 16]
    out = capsys.readouterr().out
    assert "non-fatal" in out and "boom in bonus child" in out


def test_hlo_check_detects_partitioning():
    """check_fanout_partitioned: passes on a genuinely model-sharded
    program, and FAILS when handed a replicated module text (the 'XLA
    gathered everything' failure mode it exists to catch)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from hypervla_tpu.parallel.hlo_checks import check_fanout_partitioned
    from hypervla_tpu.parallel.mesh import create_mesh, fsdp_sharding

    mesh = create_mesh(fsdp=2, tp=2)
    params = {"fanout_kernel": jnp.zeros((64, 4096), jnp.float32)}
    shardings = fsdp_sharding(mesh, params)
    placed = jax.tree_util.tree_map(jax.device_put, params, shardings)
    x = jax.device_put(
        jnp.ones((8, 64), jnp.float32),
        NamedSharding(mesh, PartitionSpec("data", None)),
    )

    @jax.jit
    def fwd(p, x):
        return (x @ p["fanout_kernel"]).sum()

    compiled = fwd.lower(placed, x).compile()
    summary = check_fanout_partitioned(compiled.as_text(), mesh, params)
    assert summary["global_shape"] == [64, 4096]
    assert summary["local_shape"] == [32, 2048]
    assert summary["collectives"]["all-reduce"] > 0

    # Negative: a module text where the kernel ALSO appears at its full
    # global shape (XLA all-gathered it somewhere) must be rejected.
    fake = "f32[32,2048] dot f32[64,4096] all-reduce f32[32,2048]"
    with pytest.raises(AssertionError, match="full global shape"):
        check_fanout_partitioned(fake, mesh, params)


def test_train_step_fsdp4_tp2():
    """The fully-sharded variant: data=1 x fsdp=4 x model=2 over 8 devices
    (every param/optimizer shard split four ways, fan-out kernels split
    across "model"). Complements dryrun_multichip's dp-heavy default."""
    from hypervla_tpu.flagship import build_flagship, make_flagship_batch
    from hypervla_tpu.parallel.mesh import fsdp_sharding
    from hypervla_tpu.train.optimizer import (
        create_optimizer,
        hn_param_type_tree,
    )
    from hypervla_tpu.train.train_state import TrainState
    from hypervla_tpu.train.train_step import make_train_step

    model, _ = build_flagship(tiny=True)
    batch = make_flagship_batch(
        batch_size=8, instr_len=8, action_horizon=2, initial_patch_dim=32
    )
    config = model.config
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params),
        **config["optimizer"],
    )
    state = TrainState.create(
        jax.random.PRNGKey(0), model.params, tx, track_ema=True
    )
    mesh = create_mesh(fsdp=4, tp=2)
    state = jax.tree_util.tree_map(
        jax.device_put, state, fsdp_sharding(mesh, state)
    )
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, mesh=mesh,
        donate=False,
    )
    state, info = step_fn(state, shard_batch(batch, mesh))
    loss = float(info["training_loss"])
    assert np.isfinite(loss)
    assert int(state.step) == 1


def test_hybrid_dcn_mesh_shape():
    """Multi-slice hybrid mesh (DP over DCN, fsdp over ICI) builds on the
    virtual 8-device platform via the contiguous-block fallback."""
    mesh = create_mesh(fsdp=2, tp=1, dcn_data=2)
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2}
    assert mesh.devices.shape == (4, 2)


def test_grad_accum_under_gspmd():
    """optax.MultiSteps gradient accumulation inside the single-jit GSPMD
    step (reference: octo/utils/train_utils.py:420-421): microbatch 1 leaves
    params untouched, microbatch 2 applies the accumulated update."""
    import copy

    from hypervla_tpu.flagship import build_flagship, make_flagship_batch
    from hypervla_tpu.parallel.mesh import fsdp_sharding
    from hypervla_tpu.train.optimizer import (
        create_optimizer,
        hn_param_type_tree,
    )
    from hypervla_tpu.train.train_state import TrainState
    from hypervla_tpu.train.train_step import make_train_step

    model, _ = build_flagship(tiny=True)
    batch = make_flagship_batch(
        batch_size=8, instr_len=8, action_horizon=2, initial_patch_dim=32
    )
    config = copy.deepcopy(model.config)
    config["optimizer"]["grad_accumulation_steps"] = 2
    # the warmup schedule is exactly 0 at optimizer count 0 (zero update
    # even when applied) — use a nonzero floor so "update landed" is testable
    config["optimizer"]["learning_rate"]["init_value"] = 1e-3
    config["optimizer"]["base_learning_rate"]["init_value"] = 1e-4
    tx, lr_fn, base_lr_fn, pnorm_fn = create_optimizer(
        model.params, hn_param_type_tree(model.params),
        **config["optimizer"],
    )
    state = TrainState.create(
        jax.random.PRNGKey(0), model.params, tx, track_ema=False
    )
    mesh = create_mesh(fsdp=2, tp=2)
    state = jax.tree_util.tree_map(
        jax.device_put, state, fsdp_sharding(mesh, state)
    )
    step_fn = make_train_step(
        model, config, tx, lr_fn, base_lr_fn, pnorm_fn, mesh=mesh,
        donate=False,
    )
    p0 = jax.device_get(state.params)
    sharded = shard_batch(batch, mesh)

    state, info1 = step_fn(state, sharded)
    p1 = jax.device_get(state.params)
    # microbatch 1 of 2: gradients held, no parameter change
    leaves0 = jax.tree_util.tree_leaves(p0)
    leaves1 = jax.tree_util.tree_leaves(p1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(a, b)
    assert np.isfinite(float(info1["training_loss"]))

    state, info2 = step_fn(state, sharded)
    p2 = jax.device_get(state.params)
    # microbatch 2 of 2: the accumulated update lands
    changed = sum(
        float(np.abs(a - b).max()) > 0
        for a, b in zip(leaves1, jax.tree_util.tree_leaves(p2))
    )
    assert changed > 0, "accumulated update never applied"
    assert int(state.step) == 2
