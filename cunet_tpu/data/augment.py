"""Host-side image augmentation: affine crop, flips, color jitter.

Behavioral rebuild of ref:pylib/HumanAug.py:115-174 (``crop``) and the
augmentation sampling of ref:data/mpii_for_mpii_22.py:121-136. Images are
HWC float32 in [0, 1] (the reference is CHW torch; its loader divides by 255,
ref:utils/imutils.py:31-40).

Resampling note: the reference crops through ``scipy.misc.imresize`` /
``imrotate``, which round-trip through uint8 and (for float inputs)
min-max-rescale via ``bytescale``. We use PIL bilinear on uint8(img*255),
which matches the reference for images containing both extremes and avoids
the bytescale range-distortion quirk; the uint8 round-trip (the
metric-affecting part, SURVEY.md §7.3 #3) is preserved.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from cunet_tpu.geometry import REF_SIZE, transform_pts_int


def sample_from_bounded_gaussian(x: float, rng: np.random.RandomState) -> float:
    """N(0, x) clamped to [-2x, 2x] (ref:data/mpii_for_mpii_22.py:12-13)."""
    return max(-2 * x, min(2 * x, rng.randn() * x))


def load_image(path: str) -> np.ndarray:
    """RGB HWC float32 in [0, 1] (ref:utils/imutils.py:38-40 semantics)."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def crop(
    img: np.ndarray,
    center,
    scale: float,
    rot: float,
    res: int,
    size: int = REF_SIZE,
) -> np.ndarray:
    """Affine crop to ``res x res``: pre-shrink when zoomed out >= 2x, pad,
    window-extract, rotate about the window center, final bilinear resize.

    Mirrors the algorithm of ref:pylib/HumanAug.py:115-174 (including the
    >= 2x pre-shrink that keeps resampling cheap and the rotation padding).
    Returns HWC float32 in [0, 1].
    """
    center = np.asarray(center, float).copy()
    scale = float(np.asarray(scale).reshape(-1)[0])
    rot = float(np.asarray(rot).reshape(-1)[0])
    u8 = _to_uint8(img)

    scale_factor = scale * size / res
    if scale_factor < 2:
        scale_factor = 1.0
    else:
        new_size = int(np.floor(max(u8.shape[0], u8.shape[1]) / scale_factor))
        if new_size < 2:
            return img.astype(np.float32)
        pil = Image.fromarray(u8)
        nw = int(np.floor(u8.shape[1] / scale_factor))
        nh = int(np.floor(u8.shape[0] / scale_factor))
        u8 = np.asarray(pil.resize((nw, nh), Image.BILINEAR))
        center = center / scale_factor
        scale = scale / scale_factor

    # crop window corners in (possibly shrunk) image coords
    ul = transform_pts_int(
        np.array([[0.0, 0.0]]), center, scale, 0, res, size, invert=True
    )[0]
    br = transform_pts_int(
        np.array([[float(res), float(res)]]), center, scale, 0, res, size, invert=True
    )[0]
    if scale_factor >= 2:
        br = br - (br - ul - res)

    pad = int(np.ceil(np.linalg.norm((br - ul).astype(float)) / 2 - (br[1] - ul[1]) / 2))
    if rot != 0:
        ul = ul - pad
        br = br + pad

    new_shape = [br[1] - ul[1], br[0] - ul[0]]
    if u8.ndim > 2:
        new_shape.append(u8.shape[2])
    window = np.zeros(new_shape, dtype=np.uint8)

    ht, wd = u8.shape[0], u8.shape[1]
    nx = max(0, -ul[0]), min(br[0], wd) - ul[0]
    ny = max(0, -ul[1]), min(br[1], ht) - ul[1]
    ox = max(0, ul[0]), min(wd, br[0])
    oy = max(0, ul[1]), min(ht, br[1])
    window[ny[0]:ny[1], nx[0]:nx[1]] = u8[oy[0]:oy[1], ox[0]:ox[1]]

    if rot != 0:
        pil = Image.fromarray(window)
        # PIL rotates counter-clockwise for positive angles, same convention
        # as scipy.misc.imrotate
        pil = pil.rotate(rot, resample=Image.BILINEAR)
        window = np.asarray(pil)
        window = window[pad:-pad, pad:-pad]

    out = Image.fromarray(window).resize((res, res), Image.BILINEAR)
    return np.asarray(out, np.float32) / 255.0


def fliplr_image(img: np.ndarray) -> np.ndarray:
    """Horizontal mirror, HWC."""
    return img[:, ::-1].copy()


def color_jitter(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Independent per-channel brightness U(0.6, 1.4), clamped to [0, 1]
    (ref:data/mpii_for_mpii_22.py:134-136)."""
    out = img.copy()
    for ch in range(out.shape[2]):
        out[:, :, ch] = np.clip(out[:, :, ch] * rng.uniform(0.6, 1.4), 0, 1)
    return out


def crop_host(img, center, scale, rot, res, size=REF_SIZE, native: bool = False):
    """Crop dispatch: ``native=True`` uses the one-pass C++ bilinear warp
    (float path, ~an order of magnitude fewer resampling passes);
    ``native=False`` keeps the PIL compat chain for reference parity."""
    if native:
        from cunet_tpu.data.native import crop_fast

        out = crop_fast(img, center, scale, rot, res, size)
        if out is not None:
            return out
    return crop(img, center, scale, rot, res, size)


def render_heatmaps_host(pts, height, width, sigma=1.0):
    """Heatmap render dispatch: the native renderer is bit-compatible with
    the Python one, so it is used whenever the library builds."""
    from cunet_tpu.data.native import render_heatmaps_native

    out = render_heatmaps_native(np.asarray(pts, float), height, width, sigma)
    if out is not None:
        return out
    from cunet_tpu.ops.heatmap import render_heatmaps_np

    return render_heatmaps_np(pts, height, width, sigma)
