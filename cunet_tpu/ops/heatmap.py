"""Gaussian heatmap target rendering — vectorized, device-friendly.

Matches the reference renderer exactly (ref:pylib/HumanPts.py:35-76), whose
quirks are metric-affecting and deliberately preserved:

- window is 7x7 (``tmp_size = ceil(3*sigma) = 3`` for sigma=1), values
  outside the window are hard zero;
- the Gaussian is **unnormalized** (peak == 1) and its denominator is
  ``(3*sigma)**2`` — NOT ``2*sigma**2`` (ref:pylib/HumanPts.py:66);
- points with x <= 0 or y <= 0 render as an all-zero channel
  (ref:pylib/HumanPts.py:43-44);
- a fully out-of-bounds window renders as all-zero (ref:pylib/HumanPts.py:55-58);
- the peak sits at the **truncated-int** point coordinate.

The reference loops per point and pastes numpy slices; here one broadcasted
``exp`` over (L, H, W) renders the whole batch channel-last on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def render_heatmaps(pts, height: int, width: int, sigma: float = 1.0):
    """(L, 2) int-truncated (x, y) points -> (H, W, L) float32 heatmaps.

    jnp implementation; wrap in ``jax.vmap`` for a batch.
    """
    tmp_size = int(np.ceil(3 * sigma))
    pts = jnp.asarray(pts)
    px = jnp.floor(pts[:, 0]).astype(jnp.int32)  # int() truncation for pos coords
    py = jnp.floor(pts[:, 1]).astype(jnp.int32)
    xs = jnp.arange(width)[None, None, :]        # (1, 1, W)
    ys = jnp.arange(height)[None, :, None]       # (1, H, 1)
    dx = xs - px[:, None, None]
    dy = ys - py[:, None, None]
    g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
                / float(tmp_size) ** 2)
    window = (jnp.abs(dx) <= tmp_size) & (jnp.abs(dy) <= tmp_size)
    valid = (pts[:, 0] > 0) & (pts[:, 1] > 0)
    maps = jnp.where(window & valid[:, None, None], g, 0.0)
    return jnp.transpose(maps, (1, 2, 0))  # (H, W, L)


def render_heatmaps_np(pts, height: int, width: int, sigma: float = 1.0) -> np.ndarray:
    """Pure-numpy host version with identical semantics (for the data
    pipeline workers and as the golden oracle in tests)."""
    tmp_size = int(np.ceil(3 * sigma))
    L = pts.shape[0]
    out = np.zeros((height, width, L), np.float32)
    xs = np.arange(width)[None, :]
    ys = np.arange(height)[:, None]
    for i in range(L):
        x, y = float(pts[i, 0]), float(pts[i, 1])
        if x <= 0 or y <= 0:
            continue
        px, py = int(x), int(y)
        dx, dy = xs - px, ys - py
        g = np.exp(-(dx**2 + dy**2) / float(tmp_size) ** 2)
        g[(np.abs(dx) > tmp_size) | (np.abs(dy) > tmp_size)] = 0
        out[:, :, i] = g
    return out
