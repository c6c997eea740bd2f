"""Test configuration: force an 8-device virtual CPU platform BEFORE jax import
so mesh/sharding tests run without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver presets axon/TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# keep tests hermetic: no AOT executable cache writes to ~/.cache (the
# dedicated tests in test_aot.py opt back in with a tmpdir)
os.environ.setdefault("HYPERVLA_AOT_CACHE", "0")

import jax  # noqa: E402  (must import after env setup)

# The axon TPU plugin ignores the env var; force the platform via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
