"""Affine crop geometry and flip tables for landmark pipelines.

Behavioral rebuild of ref:pylib/HumanAug.py. The crop transform maps a
square window of side ``size*scale`` centered at ``center`` in the original
image onto a ``res x res`` output, optionally rotated about the output
center (ref:pylib/HumanAug.py:10-34). Point transforms keep the reference's
**int truncation** (``astype(int)``, ref:pylib/HumanAug.py:42,52) in the
``_int`` variants because it is metric-affecting; float variants are for the
on-device path.
"""

from __future__ import annotations

import numpy as np

REF_SIZE = 200  # canonical person-box side; scale is in units of 200px


def get_transform(center, scale, rot, res, size=REF_SIZE) -> np.ndarray:
    """3x3 affine: original-image coords -> res x res crop coords."""
    h = size * scale
    t = np.zeros((3, 3))
    t[0, 0] = res / h
    t[1, 1] = res / h
    t[0, 2] = res * (-float(center[0]) / h + 0.5)
    t[1, 2] = res * (-float(center[1]) / h + 0.5)
    t[2, 2] = 1
    if rot != 0:
        rot = -rot  # cropping rotates the window, points rotate oppositely
        rot_rad = rot * np.pi / 180
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1]])
        # rotate about the crop center
        t_to = np.eye(3)
        t_to[:2, 2] = -res / 2
        t_from = np.eye(3)
        t_from[:2, 2] = res / 2
        t = t_from @ rot_mat @ t_to @ t
    return t


def transform_pts(pts, center, scale, rot, res, size=REF_SIZE, invert=False):
    """Float-precision affine on an (L, 2) point array."""
    t = get_transform(center, scale, rot, res, size)
    if invert:
        t = np.linalg.inv(t)
    homo = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1).T
    return (t @ homo)[:2].T


def transform_pts_int(pts, center, scale, rot, res, size=REF_SIZE, invert=False):
    """Reference-parity variant: truncates to int (ref:pylib/HumanAug.py:52)."""
    return transform_pts(pts, center, scale, rot, res, size, invert).astype(int)


def transform_preds_1indexed(coords, center, scale, rot, res, size=REF_SIZE):
    """Invert the crop affine on 1-indexed heatmap coords.

    The decode path subtracts 1 before the inverse affine and adds 1 after,
    truncating to int in between (ref:pylib/Evaluation.py:179-187).
    """
    out = transform_pts(coords - 1, center, scale, rot, res, size, invert=True)
    return out.astype(int) + 1


# --- horizontal-flip correspondence tables -------------------------------

# MPII 16-joint left/right pairs (ref:cu-net.py:32-33 order)
MPII_FLIP_PAIRS = np.array([[1, 4], [0, 5], [12, 13], [11, 14], [10, 15], [2, 3]])

# 300-W 68-landmark pairs (ref:pylib/HumanAug.py:244-251)
FACE_FLIP_PAIRS = np.array(
    [
        [0, 16], [1, 15], [2, 14], [3, 13], [4, 12], [5, 11], [6, 10], [7, 9],
        [17, 26], [18, 25], [19, 24], [20, 23], [21, 22],
        [36, 45], [37, 44], [38, 43], [39, 42], [40, 47], [41, 46],
        [31, 35], [32, 34],
        [48, 54], [49, 53], [50, 52], [59, 57], [58, 56],
        [60, 64], [61, 63], [67, 65],
    ]
)


def flip_channels(maps):
    """Horizontally mirror heatmaps. NHWC or HWC numpy/jax array
    (ref:pylib/HumanAug.py:196-208 operated on NCHW)."""
    return maps[..., :, ::-1, :]


def shuffle_flip_pairs(maps, pairs):
    """Swap left/right channels after a horizontal flip
    (ref:pylib/HumanAug.py:177-194). ``maps`` is NHWC or HWC."""
    perm = np.arange(maps.shape[-1])
    for a, b in pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return maps[..., perm]


def flip_test_merge(output, flipped_output, pairs):
    """Average the straight view with the de-flipped mirrored view
    (ref:cu-net.py:240-249): mirror W, swap L/R channels, mean."""
    unflipped = shuffle_flip_pairs(flip_channels(flipped_output), pairs)
    return (output + unflipped) / 2


def shufflelr(pts, width, pairs):
    """Flip (L,2) point coords: x -> width - x, then swap L/R rows
    (ref:pylib/HumanAug.py:234-264)."""
    out = np.array(pts, dtype=float, copy=True)
    out[:, 0] = width - out[:, 0]
    for a, b in pairs:
        out[[a, b]] = out[[b, a]]
    return out
