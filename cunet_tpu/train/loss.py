"""Intermediate-supervision heatmap loss.

The reference trainers inline plain MSE summed over every anchored output
(ref:cu-net.py:175-178): ``loss = sum_j mean((out_j - target)^2)``. The
weighted criteria in ref:pylib/Criterion.py are defined but unused by any
entry script; we ship them anyway for API completeness.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def intermediate_mse(outputs: Sequence[jnp.ndarray], target: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-anchor MSE against the same target heatmaps (fp32)."""
    t = target.astype(jnp.float32)
    return sum(jnp.mean((o.astype(jnp.float32) - t) ** 2) for o in outputs)


def weighted_l2(pred: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel weighted L2 (ref:pylib/Criterion.py:12-18: mean over batch of
    sum of weighted squared error)."""
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return jnp.sum(diff * weights) / pred.shape[0]


def weighted_sigmoid_crossentropy(
    logits: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted sigmoid BCE (ref:pylib/Criterion.py:4-10)."""
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    # log(1+exp(-x)) stable form
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(bce * weights) / logits.shape[0]
