"""Model introspection: parameter counts and per-tensor statistics.

Parity with the reference's describe/print helpers
(``utils/utils_model.py:279-346``: ``describe_model``, ``describe_params``),
operating on Flax param pytrees.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np

__all__ = ["count_params", "describe_model", "describe_params"]


def count_params(params: Mapping[str, Any]) -> int:
    return sum(int(np.prod(np.shape(p)))
               for p in jax.tree_util.tree_leaves(params))


def describe_model(params: Mapping[str, Any], name: str = "model") -> str:
    n = count_params(params)
    n_tensors = len(jax.tree_util.tree_leaves(params))
    return (f"model name: {name}\n"
            f"params number: {n}\n"
            f"params tensors: {n_tensors}\n")


def describe_params(params: Mapping[str, Any]) -> str:
    lines = [" | {:^6s} | {:^6s} | {:^6s} | {:^6s} || {:<40s}".format(
        "mean", "min", "max", "std", "param_name")]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, v in flat:
        a = np.asarray(v, np.float64)
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        lines.append(" | {:>6.3f} | {:>6.3f} | {:>6.3f} | {:>6.3f} || {:s}".format(
            a.mean(), a.min(), a.max(), a.std(), name))
    return "\n".join(lines)
