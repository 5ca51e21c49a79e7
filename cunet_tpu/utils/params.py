"""Parameter counting probes (ref:utils/util.py:152-174).

The reference used these to verify the README's ~70% parameter-saving claim
of order-K coupling vs independently stacked U-Nets (ref:README.md:6).
"""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    """Total scalar parameters (ref get_n_params / get_n_trainable_params —
    identical here: a functional pytree has no frozen leaves)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "shape")))


def count_conv_params(tree) -> int:
    """Parameters in conv kernels only (4-D leaves; ref get_n_conv_params)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "shape") and len(x.shape) == 4))


def param_summary(tree) -> dict:
    total = count_params(tree)
    conv = count_conv_params(tree)
    return {"total": total, "conv": conv, "other": total - conv}
