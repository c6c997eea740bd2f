"""AOT executable cache (utils/aot.py): the cross-process warm-start path
for the per-episode hypernet generation (VERDICT r2 item 3 — a robot
deployment cannot pay ~20 s of trace+lower+compile per process start)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypervla_tpu.utils import aot


@pytest.fixture()
def aot_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("HYPERVLA_AOT_CACHE", str(tmp_path / "aot"))
    return tmp_path / "aot"


def test_cache_key_sensitivity(aot_dir):
    args_a = (np.ones((4, 3), np.float32),)
    args_b = (np.ones((4, 4), np.float32),)  # different shape
    args_c = (np.ones((4, 3), np.float64),)  # different dtype
    k = aot.cache_key("t", args_a)
    assert k == aot.cache_key("t", args_a)  # stable
    assert k != aot.cache_key("t", args_b)
    assert k != aot.cache_key("t", args_c)
    assert k != aot.cache_key("other", args_a)
    assert k != aot.cache_key("t", args_a, context="cfg2")


def test_cold_then_warm_roundtrip(aot_dir):
    f = jax.jit(lambda x, y: {"out": x @ y + 1.0})
    args = (np.ones((8, 4), np.float32), np.ones((4, 2), np.float32))
    expect = f(*args)["out"]

    cold = aot.load_or_compile("mm", f, args)
    np.testing.assert_allclose(np.asarray(cold(*args)["out"]), expect)
    files = list(aot_dir.glob("mm-*.aotx"))
    assert len(files) == 1, "cold path must serialize the executable"

    # a "fresh process": a new jitted fn object, same cache dir
    g = jax.jit(lambda x, y: {"out": x @ y + 1.0})
    warm = aot.load_or_compile("mm", g, args)
    np.testing.assert_allclose(np.asarray(warm(*args)["out"]), expect)
    assert len(list(aot_dir.glob("mm-*.aotx"))) == 1  # reused, not rewritten


def test_shape_guard_falls_back(aot_dir):
    f = jax.jit(lambda x: x * 2.0)
    wrapped = aot.load_or_compile("dbl", f, (np.ones((4,), np.float32),))
    # matching shape goes through the executable
    np.testing.assert_allclose(
        np.asarray(wrapped(np.ones((4,), np.float32))), 2.0 * np.ones(4)
    )
    # different shape must NOT raise: falls back to the re-specializing jit
    out = wrapped(np.ones((7,), np.float32))
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.ones(7))


def test_disabled_returns_jitted(monkeypatch):
    monkeypatch.setenv("HYPERVLA_AOT_CACHE", "0")
    f = jax.jit(lambda x: x + 1)
    assert aot.load_or_compile("nop", f, (jnp.ones(3),)) is f


def test_corrupt_cache_entry_recovers(aot_dir):
    f = jax.jit(lambda x: x - 1.0)
    args = (np.ones((3,), np.float32),)
    aot.load_or_compile("c", f, args)
    (entry,) = aot_dir.glob("c-*.aotx")
    entry.write_bytes(b"garbage")
    out = aot.load_or_compile("c", f, args)(*args)
    np.testing.assert_allclose(np.asarray(out), np.zeros(3))


@pytest.mark.slow
def test_create_tasks_uses_aot_cache(aot_dir):
    """End-to-end: two independently-built models share the cached
    hypernet-generation executable and agree numerically."""
    from helpers import make_example_batch

    from hypervla_tpu.configs import tiny_test_config
    from hypervla_tpu.models.hypervla import HyperVLA

    config = tiny_test_config(encoder_type="SmallStem")
    batch = make_example_batch(image_size=64)
    instruction_dict = {
        "language_instruction": batch["task"]["language_instruction"]
    }

    model = HyperVLA.from_config(config, batch, rng=jax.random.PRNGKey(0))
    params_a, _, _ = model.create_tasks(instruction_dict=instruction_dict)
    entries = list(aot_dir.glob("hypernet_generate-*.aotx"))
    assert len(entries) == 1

    model2 = HyperVLA.from_config(config, batch, rng=jax.random.PRNGKey(0))
    params_b, _, _ = model2.create_tasks(instruction_dict=instruction_dict)
    assert len(list(aot_dir.glob("hypernet_generate-*.aotx"))) == 1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        params_a,
        params_b,
    )
