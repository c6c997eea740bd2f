

def test_fast_device_get_roundtrip():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypervla_tpu.utils.jax_utils import fast_device_get

    tree = {
        "a": jax.device_put(jnp.arange(12, dtype=jnp.float32).reshape(3, 4)),
        "b": {
            "c": jax.device_put(jnp.ones((2, 2), jnp.float32) * 3),
            "d": jax.device_put(jnp.arange(5, dtype=jnp.int32)),
            "scalar": jax.device_put(jnp.float32(7.5)),
        },
        "host": np.ones(3),  # already on host: passes through
    }
    out = fast_device_get(tree)
    flat_out = jax.tree_util.tree_leaves(out)
    assert all(isinstance(x, np.ndarray) for x in flat_out)
    jax.tree_util.tree_map(
        lambda got, want: np.testing.assert_array_equal(
            got, np.asarray(want)
        ),
        out,
        tree,
    )
    assert out["b"]["d"].dtype == np.int32
    assert out["a"].dtype == np.float32


def test_tunnel_probe_script():
    """scripts/tunnel_probe must keep printing its one JSON line with the
    stable keys (bench.py parses it; its program bytes are meant to stay
    byte-identical across rounds, so changes here are suspect)."""
    import json
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from scripts.tunnel_probe import main; main()"
    )
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    for key in ("first_fetch_s", "roundtrip_ms_median", "roundtrip_ms_best",
                "fetch512k_ms_median"):
        assert isinstance(rec[key], float), (key, rec)
