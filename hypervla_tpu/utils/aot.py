"""AOT executable cache: skip trace+lower+compile across processes.

The persistent HLO compilation cache (utils/jax_utils.py) only removes the
backend-compile step — a warm process still pays tracing + lowering + cache
key hashing (~4s for the hypernet generator on a 1-core TPU-VM host). A real
robot deployment cannot pay that per process start, so this module caches the
SERIALIZED COMPILED EXECUTABLE (jax.experimental.serialize_executable):
a warm start deserializes in milliseconds and goes straight to dispatch.

Staleness safety: the cache key includes the jax/jaxlib versions, the
backend platform + device kind, the argument treedef/shapes/dtypes, a
caller-supplied context (e.g. the model config), and a content hash of the
hypervla_tpu package sources — any code edit invalidates the entry.

Opt-out with HYPERVLA_AOT_CACHE=0; relocate with HYPERVLA_AOT_CACHE=<dir>.
"""
import hashlib
import logging
import os
import pickle
import tempfile
from pathlib import Path
from typing import Callable, Optional

import jax

_PACKAGE_HASH = None


def _package_source_hash() -> str:
    """Content hash of every .py file in the hypervla_tpu package."""
    global _PACKAGE_HASH
    if _PACKAGE_HASH is None:
        import hypervla_tpu

        root = Path(hypervla_tpu.__file__).parent
        h = hashlib.sha256()
        for path in sorted(root.rglob("*.py")):
            h.update(str(path.relative_to(root)).encode())
            h.update(path.read_bytes())
        _PACKAGE_HASH = h.hexdigest()
    return _PACKAGE_HASH


def aot_cache_dir() -> Optional[Path]:
    env = os.environ.get("HYPERVLA_AOT_CACHE")
    if env == "0":
        return None
    base = Path(env) if env else (
        Path.home() / ".cache" / "hypervla_tpu" / "aot"
    )
    base.mkdir(parents=True, exist_ok=True)
    return base


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda x: (tuple(getattr(x, "shape", ())),
                   str(getattr(x, "dtype", type(x).__name__))),
        tree,
    )


def cache_key(tag: str, example_args, context="") -> str:
    device = jax.devices()[0]
    h = hashlib.sha256()
    for part in (
        tag,
        jax.__version__,
        getattr(jax, "__version_info__", ""),
        device.platform,
        getattr(device, "device_kind", ""),
        repr(jax.tree_util.tree_structure(example_args)),
        repr(_abstract(example_args)),
        repr(context),
        _package_source_hash(),
    ):
        h.update(repr(part).encode())
    return h.hexdigest()[:32]


def _shape_guard(executable: Callable, jitted_fn: Callable,
                 example_args) -> Callable:
    """AOT executables are shape-specialized; calls with a different
    signature re-route to the plain jitted fn (which re-specializes)."""
    expected = (
        jax.tree_util.tree_structure(example_args),
        _abstract(example_args),
    )
    dead = []

    def call(*args):
        sig = (jax.tree_util.tree_structure(args), _abstract(args))
        if sig == expected and not dead:
            try:
                return executable(*args)
            except Exception as e:
                # e.g. an executable deserialized onto a host whose machine
                # features differ from the compile host — permanently route
                # to the re-specializing jit path instead
                dead.append(e)
                logging.warning(f"AOT executable failed at call time: {e}")
        return jitted_fn(*args)

    return call


def load_or_compile(tag: str, jitted_fn: Callable, example_args,
                    context="") -> Callable:
    """Returns a callable for `jitted_fn` specialized to example_args' shapes.

    Warm path: deserializes the cached executable (no trace/lower/compile).
    Cold path: lowers + compiles, serializes to the cache, returns the
    compiled executable. Any failure falls back to the plain jitted fn, and
    calls whose shapes/dtypes differ from example_args re-route to it too.
    """
    cache = aot_cache_dir()
    if cache is None:
        return jitted_fn
    from jax.experimental import serialize_executable

    key = cache_key(tag, example_args, context)
    path = cache / f"{tag}-{key}.aotx"
    if path.exists():
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree, n_devices = pickle.load(f)
            # deserialize defaults to ALL local devices; a single-device
            # program loaded on a multi-device host then demands N shards.
            # Pin execution to the first n_devices (matches how this repo
            # builds meshes: a prefix of jax.devices()).
            loaded = serialize_executable.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:n_devices],
            )
            logging.info(f"AOT cache hit for {tag} ({path.name})")
            return _shape_guard(loaded, jitted_fn, example_args)
        except Exception as e:
            logging.warning(f"AOT cache load failed for {tag}: {e}")
    try:
        compiled = jitted_fn.lower(*example_args).compile()
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        shardings = jax.tree_util.tree_leaves(compiled.input_shardings)
        n_devices = (
            max(len(s.device_set) for s in shardings) if shardings else 1
        )
        fd, tmp = tempfile.mkstemp(dir=str(cache), suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, n_devices), f)
        os.replace(tmp, path)  # atomic: concurrent processes race safely
        logging.info(
            f"AOT cache wrote {tag} ({path.name}, "
            f"{path.stat().st_size / 1e6:.1f} MB)"
        )
        return _shape_guard(compiled, jitted_fn, example_args)
    except Exception as e:
        logging.warning(f"AOT compile/serialize failed for {tag}: {e}")
        return jitted_fn
