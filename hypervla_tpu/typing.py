"""Shared type aliases (parity: octo/utils/typing.py:1-11)."""
from typing import Any, Mapping, Sequence, Union

import jax

PRNGKey = jax.Array
PyTree = Union[jax.Array, Mapping[str, "PyTree"]]
Config = Union[Any, Mapping[str, "Config"]]
Params = Mapping[str, PyTree]
Data = Mapping[str, PyTree]
Shape = Sequence[int]
Dtype = Any
