"""Gaussian heatmap target rendering — vectorized, device-friendly.

Matches the reference renderer exactly (ref:pylib/HumanPts.py:35-76), whose
quirks are metric-affecting and deliberately preserved:

- window corners are ``int(pt +/- 3*sigma)`` with **truncation toward zero**
  (ref:pylib/HumanPts.py:52-53), so for fractional coords in (0, 3) the
  window — and with it the peak, which always sits at ``ul + 3`` — shifts
  toward the image edge (the face dataset feeds fractional points,
  ref:data/face_bbx.py:131);
- the Gaussian is **unnormalized** (peak == 1) and its denominator is
  ``(3*sigma)**2`` — NOT ``2*sigma**2`` (ref:pylib/HumanPts.py:66);
- values outside the (2*3sigma+1)^2 window are hard zero;
- points with x <= 0 or y <= 0 render as an all-zero channel
  (ref:pylib/HumanPts.py:43-44);
- a fully out-of-bounds window renders as all-zero (ref:pylib/HumanPts.py:55-58).

The reference loops per point and pastes numpy slices; here one broadcasted
``exp`` over (L, H, W) renders all channels on device, channel-last.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def render_heatmaps(pts, height: int, width: int, sigma: float = 1.0):
    """(L, 2) (x, y) points -> (H, W, L) float32 heatmaps (jnp; vmap-able)."""
    t = float(np.ceil(3 * sigma))
    ti = int(t)
    pts = jnp.asarray(pts, jnp.float32)
    ulx = jnp.trunc(pts[:, 0] - t).astype(jnp.int32)
    uly = jnp.trunc(pts[:, 1] - t).astype(jnp.int32)
    brx = jnp.trunc(pts[:, 0] + t).astype(jnp.int32)
    bry = jnp.trunc(pts[:, 1] + t).astype(jnp.int32)
    cx = ulx + ti  # peak pixel (ref pastes the 7x7 grid at ul; center idx 3)
    cy = uly + ti
    xs = jnp.arange(width)[None, None, :]
    ys = jnp.arange(height)[None, :, None]
    dx = (xs - cx[:, None, None]).astype(jnp.float32)
    dy = (ys - cy[:, None, None]).astype(jnp.float32)
    g = jnp.exp(-(dx**2 + dy**2) / (t * t))
    in_win = (
        (xs >= ulx[:, None, None]) & (xs <= brx[:, None, None])
        & (ys >= uly[:, None, None]) & (ys <= bry[:, None, None])
    )
    valid = (pts[:, 0] > 0) & (pts[:, 1] > 0)
    visible = (ulx < width) & (uly < height) & (brx >= 0) & (bry >= 0)
    keep = (valid & visible)[:, None, None]
    maps = jnp.where(in_win & keep, g, 0.0)
    return jnp.transpose(maps, (1, 2, 0))  # (H, W, L)


def render_heatmaps_np(pts, height: int, width: int, sigma: float = 1.0) -> np.ndarray:
    """Pure-numpy host version with identical semantics (data-pipeline
    workers; golden oracle in tests)."""
    t = float(np.ceil(3 * sigma))
    ti = int(t)
    pts = np.asarray(pts, np.float64)
    L = pts.shape[0]
    out = np.zeros((height, width, L), np.float32)
    xs = np.arange(width)[None, :]
    ys = np.arange(height)[:, None]
    for i in range(L):
        x, y = float(pts[i, 0]), float(pts[i, 1])
        if x <= 0 or y <= 0:
            continue
        ulx, uly = int(x - t), int(y - t)  # trunc toward zero, like int()
        brx, bry = int(x + t), int(y + t)
        if ulx >= width or uly >= height or brx < 0 or bry < 0:
            continue
        cx, cy = ulx + ti, uly + ti
        g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (t * t))
        g[(xs < ulx) | (xs > brx) | np.broadcast_to((ys < uly) | (ys > bry), g.shape)] = 0
        out[:, :, i] = g
    return out


def draw_labelmap_np(
    img: np.ndarray, pt, sigma: float, kind: str = "gaussian"
) -> np.ndarray:
    """Standard-variance label map painter (ref:utils/imutils.py:68-101).

    Unlike the main renderer this uses the conventional ``2*sigma**2``
    denominator (or a Cauchy kernel) and pastes over an existing image.
    Unused by the reference's main path but part of its API surface.
    """
    out = np.array(img, np.float32, copy=True)
    hgt, wdt = out.shape[:2]
    ul = [int(pt[0] - 3 * sigma), int(pt[1] - 3 * sigma)]
    br = [int(pt[0] + 3 * sigma + 1), int(pt[1] + 3 * sigma + 1)]
    if ul[0] >= wdt or ul[1] >= hgt or br[0] < 0 or br[1] < 0:
        return out
    size = 6 * int(sigma) + 1
    x = np.arange(0, size, 1, float)
    y = x[:, None]
    x0 = y0 = size // 2
    if kind == "gaussian":
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
    elif kind == "cauchy":
        g = sigma / (((x - x0) ** 2 + (y - y0) ** 2 + sigma**2) ** 1.5)
    else:
        raise ValueError(f"unknown kernel kind: {kind}")
    gx = max(0, -ul[0]), min(br[0], wdt) - ul[0]
    gy = max(0, -ul[1]), min(br[1], hgt) - ul[1]
    ix = max(0, ul[0]), min(br[0], wdt)
    iy = max(0, ul[1]), min(br[1], hgt)
    out[iy[0]:iy[1], ix[0]:ix[1]] = g[gy[0]:gy[1], gx[0]:gx[1]]
    return out
