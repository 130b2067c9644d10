"""Numerical debugging aids (SURVEY.md §5: the reference's DEBUG NaN scans
render_utils.py:170-172 and typeguard shape contracts, rebuilt JAX-native).

- ``enable_nan_checks()``: turn on jax_debug_nans — every jitted op that
  produces a NaN re-runs un-jitted and raises with the offending primitive.
- ``check_finite(tree, name)``: host-side scan of a pytree (use outside jit,
  e.g. on fetched metrics or checkpoints before saving).
- ``assert_shape(x, shape, name)``: lightweight shape contract; dims given
  as None are unconstrained (the torchtyping-contract analogue of reference
  nerf.py:136-139).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keys = "/".join(str(p) for p in path)
            n_bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"[Numerical Error] {name}{keys} contains {n_bad} non-finite "
                f"values (shape {arr.shape})"
            )


def assert_shape(x, shape: Sequence[Optional[int]], name: str = "array") -> None:
    actual = tuple(x.shape)
    if len(actual) != len(shape) or any(
        want is not None and got != want for got, want in zip(actual, shape)
    ):
        raise AssertionError(
            f"{name}: expected shape {tuple(shape)}, got {actual}"
        )
