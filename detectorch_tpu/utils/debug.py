"""Debug-mode numerical checking.

XLA programs are race-free by construction (the reference needed atomicAdd
and cudaGetLastError for its CUDA kernels — SURVEY §5 'race detection');
what remains worth checking on TPU is numeric health. This module wraps a
function with jax.experimental.checkify so NaN/Inf production inside the
compiled program surfaces as a structured error instead of silently
propagating into detections.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import checkify


def checked(fn, errors=checkify.float_checks):
    """Wrap `fn` with checkify NaN/div-by-zero checks.

    Returns wrapped(*args) -> output; raises ValueError with the original
    check message if any check fired. Compiles like the original (checks add
    modest overhead — debug use only).
    """

    cfn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def assert_finite_tree(tree, name: str = "tree"):
    """Host-side finiteness assertion over a pytree (post-hoc debugging)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise AssertionError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
