"""Heatmap decoding + PCK metrics, vectorized.

Behavioral rebuild of ref:pylib/Evaluation.py. The decode math is full of
1-indexing and int truncation that is metric-affecting (SURVEY.md §7.3 #3);
every quirk is preserved and unit-tested against hand-computed goldens:

- ``get_preds``: 1-indexed argmax over flattened H*W, zeroed where the max
  is <= 0 (ref:pylib/Evaluation.py:6-23);
- ``final_preds``: quarter-pixel shift by the sign of the neighbor gradient
  (only when 1 < px < W and 1 < py < H), then +0.5, then inverse crop
  affine with the -1/truncate/+1 dance (ref:pylib/Evaluation.py:108-132);
- ``calc_dists``: per-joint L2 over the per-image normalizer, -1 sentinel
  for invisible joints (target <= boundary) (ref:pylib/Evaluation.py:25-40);
- ``accuracy``: PCK vs the argmax of the ground-truth heatmap with
  norm = W/10 (ref:pylib/Evaluation.py:55-83).

Arrays are NHWC (channel-last); the reference is NCHW.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from cunet_tpu.geometry import transform_preds_1indexed

# Training-time PCK joint subset (ref:cu-net.py:101)
MPII_TRAIN_IDX = [0, 1, 2, 3, 4, 5, 10, 11, 14, 15]
# Origin-resolution PCKh subset (ref:pylib/Evaluation.py:90)
MPII_ORIGIN_IDX = [0, 1, 2, 3, 4, 5, 8, 9, 10, 11, 12, 13, 14, 15]


def get_preds(scores: np.ndarray) -> np.ndarray:
    """(N, H, W, C) heatmaps -> (N, C, 2) 1-indexed (x, y); 0 where max <= 0.

    Ties resolve to the first flattened index (torch.max semantics). The
    reference divides the flat index by H when deriving y
    (ref:pylib/Evaluation.py:19) — correct only because maps are square; we
    keep exact parity for square maps by dividing by W.
    """
    n, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(n, c, h * w)
    idx = np.argmax(flat, axis=2)
    maxval = np.take_along_axis(flat, idx[:, :, None], axis=2)[:, :, 0]
    x = idx % w + 1
    y = idx // w + 1
    preds = np.stack([x, y], axis=2).astype(np.float64)
    preds *= (maxval > 0)[:, :, None]
    return preds


def quarter_pixel_refine(scores: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Shift 1-indexed argmax coords by 0.25*sign(neighbor gradient), then
    +0.5 (ref:pylib/Evaluation.py:112-120)."""
    n, h, w, c = scores.shape
    hm = scores.transpose(0, 3, 1, 2)  # (N, C, H, W)
    out = coords.copy()
    px = np.floor(coords[..., 0]).astype(int)
    py = np.floor(coords[..., 1]).astype(int)
    ok = (px > 1) & (px < w) & (py > 1) & (py < h)
    ni, ci = np.nonzero(ok)
    pxo, pyo = px[ni, ci], py[ni, ci]
    # 1-indexed coords into 0-indexed arrays: hm[py-1, px] is right neighbor
    dx = hm[ni, ci, pyo - 1, pxo] - hm[ni, ci, pyo - 1, pxo - 2]
    dy = hm[ni, ci, pyo, pxo - 1] - hm[ni, ci, pyo - 2, pxo - 1]
    out[ni, ci, 0] += np.sign(dx) * 0.25
    out[ni, ci, 1] += np.sign(dy) * 0.25
    return out + 0.5


def final_preds(scores, centers, scales, res, rots) -> np.ndarray:
    """Decode to original-image coordinates (ref:pylib/Evaluation.py:108-132).

    Args: scores (N,H,W,C) NHWC; centers (N,2); scales (N,); res (w,h); rots (N,).
    Returns (N, C, 2) integer original-resolution predictions.
    """
    coords = quarter_pixel_refine(scores, get_preds(scores))
    preds = np.zeros_like(coords)
    for i in range(coords.shape[0]):
        preds[i] = transform_preds_1indexed(
            coords[i], np.asarray(centers[i]), float(scales[i]), float(rots[i]), res[0]
        )
    return preds


def calc_dists(preds, target, normalize, use_zero: bool = False) -> np.ndarray:
    """(C, N) normalized distances; -1 where target <= boundary
    (ref:pylib/Evaluation.py:25-40)."""
    boundary = 0 if use_zero else 1
    d = np.linalg.norm(preds[..., :2] - target[..., :2], axis=2)  # (N, C)
    d = d / np.asarray(normalize, dtype=float)[:, None]
    visible = (target[..., 0] > boundary) & (target[..., 1] > boundary)
    return np.where(visible, d, -1.0).T


def dist_acc(dists: np.ndarray, thr: float = 0.5) -> float:
    """Fraction <= thr among valid (!= -1); -1 if none valid
    (ref:pylib/Evaluation.py:42-53)."""
    valid = dists != -1
    if valid.sum() == 0:
        return -1.0
    return float(((dists <= thr) & valid).sum() / valid.sum())


def _per_idx_acc(dists: np.ndarray, idxs: Sequence[int], thr: float = 0.5) -> np.ndarray:
    acc = np.zeros(len(idxs) + 1)
    cnt = 0
    for i, j in enumerate(idxs):
        acc[i + 1] = dist_acc(dists[j], thr)
        if acc[i + 1] >= 0:
            acc[0] += acc[i + 1]
            cnt += 1
    if cnt:
        acc[0] /= cnt
    return acc


def accuracy(output, target, idxs=MPII_TRAIN_IDX, thr: float = 0.5) -> np.ndarray:
    """Heatmap-space PCK against the ground-truth heatmap argmax,
    norm = W/10 (ref:pylib/Evaluation.py:55-83). acc[0] is the average."""
    output = np.asarray(output, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    preds = get_preds(output)
    gts = get_preds(target)
    norm = np.full(preds.shape[0], output.shape[2] / 10.0)
    return _per_idx_acc(calc_dists(preds, gts, norm), idxs, thr)


def accuracy_origin_res(
    output, centers, scales, res, grnd_pts, normalizers, rots,
    idxs=MPII_ORIGIN_IDX, thr: float = 0.5,
) -> np.ndarray:
    """PCKh at original resolution with dataset normalizers
    (ref:pylib/Evaluation.py:86-106)."""
    preds = final_preds(np.asarray(output, np.float32), centers, scales, res, rots)
    dists = calc_dists(preds, np.asarray(grnd_pts, float), normalizers, use_zero=True)
    return _per_idx_acc(dists, idxs, thr)


def per_image_nme(pred: np.ndarray, ann: np.ndarray) -> np.ndarray:
    """Inter-ocular-normalized mean error per image
    (ref:pylib/FaceAcc.py:64-79): 68-lmk uses pts 36<->45, 7-lmk 0<->3."""
    n, L = pred.shape[0], pred.shape[1]
    out = np.zeros(n)
    a, b = (36, 45) if L == 68 else (0, 3)
    for i in range(n):
        inter = np.linalg.norm(ann[i, a] - ann[i, b])
        out[i] = np.sum(np.linalg.norm(pred[i] - ann[i], axis=1)) / (inter * L)
    return out
