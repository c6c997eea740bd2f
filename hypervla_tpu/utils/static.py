"""StaticDict: a dict usable as a static (non-pytree) field of flax
struct.dataclasses.

jit cache keys compare static fields with == and hash them; plain dicts
holding numpy arrays raise "truth value of an array is ambiguous" the moment
two model instances coexist. StaticDict compares by recursive array equality
and hashes to a constant (equality does the real work; a hash collision only
costs a dict-probe comparison).
"""
import numpy as np


def tree_equal(a, b) -> bool:
    if isinstance(a, dict) and isinstance(b, dict):
        if set(a.keys()) != set(b.keys()):
            return False
        return all(tree_equal(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            tree_equal(x, y) for x, y in zip(a, b)
        )
    if hasattr(a, "shape") or hasattr(b, "shape"):
        try:
            return bool(np.array_equal(np.asarray(a), np.asarray(b)))
        except Exception:
            return a is b
    return a == b


class StaticDict(dict):
    """dict with array-safe equality and a constant hash."""

    def __eq__(self, other):
        if self is other:
            return True
        if not isinstance(other, dict):
            return NotImplemented
        return tree_equal(dict(self), dict(other))

    def __ne__(self, other):
        result = self.__eq__(other)
        if result is NotImplemented:
            return result
        return not result

    def __hash__(self):
        return 0


def _flatten_static_dict(d):
    keys = sorted(d.keys(), key=str)
    return [d[k] for k in keys], tuple(keys)


def _unflatten_static_dict(keys, values):
    return StaticDict(zip(keys, values))


import jax  # noqa: E402

jax.tree_util.register_pytree_node(
    StaticDict, _flatten_static_dict, _unflatten_static_dict
)


def static_dict(tree):
    """Recursively wraps nested dicts (top level only needs wrapping for
    equality, but wrapping throughout keeps slicing/copies safe)."""
    if tree is None:
        return None
    if isinstance(tree, dict):
        return StaticDict({k: static_dict(v) for k, v in tree.items()})
    return tree


def to_plain(tree):
    """Inverse of static_dict: plain builtin dicts (msgpack/json-safe)."""
    if isinstance(tree, dict):
        return {k: to_plain(v) for k, v in tree.items()}
    return tree
