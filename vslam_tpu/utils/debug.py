"""Debug guards: finite-state assertions.

The reference poisons Eigen matrices with NaN in debug builds to surface
uninitialized reads (CMakeLists.txt:58-59). The functional-state analogue:
assert every array in the SLAM state is finite after each frame
(config.debug_checks). Costs one device reduction per array — debug only.
"""

from __future__ import annotations

import jax.numpy as jnp


def find_nonfinite(tree, mask_tree=None) -> dict:
    """Names of state arrays containing non-finite values.

    For NamedTuple pytrees; float arrays only. Returns {field: count}.
    """
    bad = {}
    for name, val in tree._asdict().items():
        if not hasattr(val, "dtype") or not jnp.issubdtype(val.dtype,
                                                           jnp.floating):
            continue
        n = int(jnp.sum(~jnp.isfinite(val)))
        if n:
            bad[name] = n
    return bad


def assert_finite_state(slam) -> None:
    """Raise if any pose/landmark array went non-finite (debug_checks)."""
    problems = {}
    for label, tree in (("lm", slam.lm), ("kf", slam.kf),
                        ("track", slam.track)):
        for field, count in find_nonfinite(tree).items():
            problems[f"{label}.{field}"] = count
    if problems:
        raise FloatingPointError(
            f"non-finite SLAM state after frame {slam.frame}: {problems}")
