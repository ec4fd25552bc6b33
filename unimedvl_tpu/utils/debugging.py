"""Debug-mode numerical checking (SURVEY.md §5 race-detection/sanitizers row):
jax.checkify wrapping for NaN / division / OOB-index errors inside jitted
programs, plus a NaN-scan helper for pytrees.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap a jittable fn so it raises structured errors on NaN/OOB instead of
    silently propagating garbage. Use in debug runs only (adds overhead).

    Example:
        step = checked(lambda p, x: model.forward(p, x))
        out = step(params, x)   # raises JaxRuntimeError on NaN
    """
    from jax.experimental import checkify

    errors = errors or (
        checkify.float_checks | checkify.index_checks | checkify.div_checks
    )
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def find_nonfinite(tree: Any, prefix: str = "") -> Dict[str, int]:
    """Scan a pytree for non-finite values; returns {path: count} (host op)."""
    import numpy as np

    bad = {}

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            n = int(np.sum(~np.isfinite(np.asarray(leaf, dtype=np.float32))))
            if n:
                bad[prefix + jax.tree_util.keystr(path)] = n

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad
