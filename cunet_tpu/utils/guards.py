"""Numerical-health guards: NaN/Inf detection over pytrees.

The reference has no sanitizers beyond a warnings hook (ref:cu-net.py:2-8).
On TPU the failure mode that matters is silent non-finite propagation
(bf16 overflow, dead quantized gradients); these helpers make a train loop
fail fast. ``check_finite`` stays inside jit (one fused all-reduce);
``find_nonfinite`` is the host-side diagnostic that names offending leaves.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree) -> jnp.ndarray:
    """Scalar bool: every array leaf in the tree is finite. Jit-safe."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    oks = [jnp.all(jnp.isfinite(x.astype(jnp.float32))) for x in leaves]
    return jnp.stack(oks).all()


def find_nonfinite(tree) -> List[str]:
    """Host-side: names of leaves containing NaN/Inf (for error messages)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and np.issubdtype(np.asarray(leaf).dtype, np.floating):
            arr = np.asarray(leaf, np.float32)
            if not np.isfinite(arr).all():
                n_bad = int((~np.isfinite(arr)).sum())
                bad.append(f"{jax.tree_util.keystr(path)} ({n_bad}/{arr.size} non-finite)")
    return bad


def assert_finite(tree, name: str = "tree"):
    """Host-side hard check with a leaf-naming error."""
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: " + "; ".join(bad[:10]))


def guard_update(new_state, old_state, metrics: Dict):
    """Skip-on-NaN update rule: if the step produced non-finite params or
    loss, keep the previous state (preemption-safe training never writes a
    poisoned checkpoint). Jit-safe."""
    ok = check_finite(new_state.params) & jnp.isfinite(metrics["loss"])
    merged = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old) if hasattr(new, "dtype") else new,
        new_state,
        old_state,
    )
    return merged, ok
