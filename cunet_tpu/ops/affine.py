"""On-device affine warp + batched target rendering (SURVEY.md §7.1 item 3).

The reference's crop is a host-side scipy/PIL chain (ref:pylib/HumanAug.py:115-174).
For TPU-resident augmentation, this module provides the same geometry as one
vectorized bilinear gather: ``jax.vmap``'d over per-sample crop matrices, so a
whole batch of crops + heatmap targets renders on device. Matches the native
C++ warp's float path (zero padding outside, bilinear, inverse mapping).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cunet_tpu.geometry import REF_SIZE, get_transform


def affine_warp(img: jnp.ndarray, inv_t: jnp.ndarray, out_res: int) -> jnp.ndarray:
    """Warp one HWC image: ``inv_t`` (3x3) maps OUTPUT coords -> SOURCE coords.

    Bilinear sampling with zero padding outside the source. jit/vmap-able.
    """
    h, w = img.shape[0], img.shape[1]
    oy = jnp.arange(out_res, dtype=jnp.float32)
    ox = jnp.arange(out_res, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ox, oy)  # (out, out)
    sx = inv_t[0, 0] * gx + inv_t[0, 1] * gy + inv_t[0, 2]
    sy = inv_t[1, 0] * gx + inv_t[1, 1] * gy + inv_t[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]  # gather (out, out, C)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out.astype(img.dtype)


def crop_on_device(
    imgs: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    rots: jnp.ndarray,
    out_res: int,
    std_size: int = REF_SIZE,
) -> jnp.ndarray:
    """Batched crop: (N, H, W, C) same-size images + per-sample (center,
    scale, rot) -> (N, out_res, out_res, C). The crop matrices are tiny and
    computed on host (they depend on numpy-side annotation data)."""
    inv_ts = np.stack(
        [
            np.linalg.inv(get_transform(np.asarray(c), float(s), float(r),
                                        out_res, std_size))
            for c, s, r in zip(np.asarray(centers), np.asarray(scales),
                               np.asarray(rots))
        ]
    ).astype(np.float32)
    return jax.vmap(lambda im, t: affine_warp(im, t, out_res))(
        imgs, jnp.asarray(inv_ts)
    )


def render_batch_heatmaps(pts: jnp.ndarray, out_res: int, sigma: float = 1.0):
    """Batched on-device target rendering: (N, L, 2) -> (N, out, out, L),
    reference-exact semantics (cunet_tpu.ops.heatmap.render_heatmaps)."""
    from cunet_tpu.ops.heatmap import render_heatmaps

    return jax.vmap(lambda p: render_heatmaps(p, out_res, out_res, sigma))(pts)
