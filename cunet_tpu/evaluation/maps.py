"""Auxiliary map generators and face-landmark utilities.

Behavioral rebuild of the remaining pylib numerics surface:
ref:pylib/HumanPts.py:78-333 (part heatmaps, disk/ellipse/polygon response
maps, foreground weight maps), ref:pylib/FacePts.py (68->7 reduction,
center/bbox helpers, landmark<->resmap conversions),
ref:pylib/FaceAcc.py:10-131 (segmentation f1/accuracy, component NME,
decode variants). All pure numpy; ellipse/polygon rasterization uses direct
implicit-equation masks rather than vendored scikit-image code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cunet_tpu.evaluation.decode import get_preds, quarter_pixel_refine
from cunet_tpu.ops.heatmap import render_heatmaps_np

# MPII limb pairs for part maps (ref:pylib/HumanPts.py:79-80)
PART_PAIRS = np.array(
    [[0, 1], [1, 2], [3, 4], [4, 5], [10, 11], [11, 12], [13, 14], [14, 15],
     [6, 7], [8, 9]]
)
# body-part ellipses (ref:pylib/HumanPts.py:150-151; torso polygon corners :202)
BODY_PART_PAIRS = np.array(
    [[0, 1], [1, 2], [3, 4], [4, 5], [10, 11], [11, 12], [13, 14], [14, 15], [8, 9]]
)
TORSO_CORNERS = np.array([12, 13, 3, 2])


def pts2heatmap_part(pts, shape, sigma: float = 1.0) -> np.ndarray:
    """Limb midpoint Gaussians, channel-last (ref:pylib/HumanPts.py:78-89)."""
    mids = []
    valid = []
    for a, b in PART_PAIRS:
        p1, p2 = pts[a].astype(float), pts[b].astype(float)
        bad = (p1[0] <= 0 and p1[1] <= 0) or (p2[0] <= 0 and p2[1] <= 0)
        mids.append((p1 + p2) / 2.0 if not bad else np.array([-1.0, -1.0]))
        valid.append(not bad)
    return render_heatmaps_np(np.array(mids), shape[0], shape[1], sigma)


def pts2resmap(pts, shape, radius: float) -> Tuple[np.ndarray, np.ndarray]:
    """Per-point disk masks (ref:pylib/HumanPts.py:112-131).

    Returns (resmap [H, W, L], valid_pts [L, 2] zeroed where skipped)."""
    L = pts.shape[0]
    out = np.zeros((shape[0], shape[1], L), np.float32)
    valid = np.zeros_like(np.asarray(pts, float))
    ys = np.arange(shape[0])[:, None]
    xs = np.arange(shape[1])[None, :]
    for i in range(L):
        x, y = float(pts[i][0]), float(pts[i][1])
        if x <= 0 or y <= 0 or x > shape[1] or y > shape[0]:
            continue
        mask = (xs - x) ** 2 + (ys - y) ** 2 <= radius * radius
        out[:, :, i][mask] = 1
        valid[i] = pts[i]
    return out, valid


def _ellipse_mask(shape, center_rc, semi_minor, semi_major, rotation) -> np.ndarray:
    """Implicit rotated-ellipse mask: ((r cos a + c sin a)/r_rad)^2 +
    ((r sin a - c cos a)/c_rad)^2 <= 1 over the full grid."""
    rot = rotation % np.pi
    sin_a, cos_a = np.sin(rot), np.cos(rot)
    r = np.arange(shape[0])[:, None] - center_rc[0]
    c = np.arange(shape[1])[None, :] - center_rc[1]
    d = ((r * cos_a + c * sin_a) / semi_minor) ** 2 + (
        (r * sin_a - c * cos_a) / semi_major
    ) ** 2
    return d <= 1


def _polygon_mask(vertices_xy, shape) -> np.ndarray:
    """Point-in-polygon fill via matplotlib Path (the reference's mechanism,
    ref:pylib/HumanPts.py:211-231)."""
    from matplotlib.path import Path

    x, y = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]))
    pts = np.vstack((x.flatten(), y.flatten())).T
    grid = Path(vertices_xy).contains_points(pts)
    return grid.reshape((shape[0], shape[1]))


def pts2resmap_body_part(
    pts, shape, ann_size: float, vis: Optional[np.ndarray] = None
) -> np.ndarray:
    """Elliptical limb masks + torso polygon, channel-last
    (ref:pylib/HumanPts.py:149-209 semantics incl. the semi-minor clamps)."""
    part_num = BODY_PART_PAIRS.shape[0]
    out = np.zeros((shape[0], shape[1], part_num + 1), np.float32)
    for i, (a, b) in enumerate(BODY_PART_PAIRS):
        if vis is not None and (vis[a] == 0 or vis[b] == 0):
            continue
        p1, p2 = pts[a].astype(float), pts[b].astype(float)
        if (
            p1[0] <= 0 or p1[1] <= 0 or p2[0] <= 0 or p2[1] <= 0
            or p1[0] > shape[0] or p1[1] > shape[0]
            or p2[0] > shape[1] or p2[1] > shape[1]
        ):
            continue
        center = (p1 + p2) / 2.0
        semi_major = np.linalg.norm(p1 - p2) / 2
        if i in (0, 1, 2, 3):
            semi_minor = ann_size * 2
        elif i in (4, 7):
            semi_minor = ann_size
        elif i in (5, 6):
            semi_minor = ann_size * 1.5
        else:  # head (8)
            semi_minor = semi_major
        semi_minor = min(semi_minor, semi_major * 2.0 / 3)
        semi_minor = max(semi_minor, semi_major * 1.0 / 3)
        if i == 8:
            semi_minor = semi_major
        semi_major = max(semi_major, ann_size)
        semi_minor = max(semi_minor, ann_size)
        vec = p1 - p2
        angle = np.pi - np.arctan2(vec[1], vec[0])
        mask = _ellipse_mask(shape, (center[1], center[0]), semi_minor, semi_major, angle)
        out[:, :, i][mask] = 1
    verts = np.asarray(pts, float)[TORSO_CORNERS]
    if vis is None or np.sum(np.asarray(vis)[TORSO_CORNERS]) == 0:
        if (verts > 0).all() and (verts < shape[0]).all():
            out[:, :, part_num][_polygon_mask(verts, shape)] = 1
    return out


def weights_from_grnd_maps(maps, fgrnd_weight: float, bgrnd_weight: float) -> np.ndarray:
    """Foreground-balanced per-pixel weights, channel-last
    (ref:pylib/HumanPts.py:133-147: int-truncated background/foreground
    ratio scaled by fg/bg)."""
    maps = np.asarray(maps)
    weights = np.ones_like(maps, np.float32)
    per_map = maps.shape[0] * maps.shape[1]
    factor = float(fgrnd_weight) / float(bgrnd_weight)
    for i in range(maps.shape[2]):
        fg = maps[:, :, i] > 0
        n_fg = int(fg.sum())
        if n_fg == 0:
            continue
        weights[:, :, i][fg] = int(float(per_map - n_fg) / n_fg * factor)
    return weights


# --------------------------------------------------------------------------
# face landmark utilities (ref:pylib/FacePts.py)
# --------------------------------------------------------------------------

_LMK68_TO_7 = np.array([37, 40, 43, 46, 31, 49, 55]) - 1  # ref :58-74


def lmk68_to_7(lmk: np.ndarray) -> np.ndarray:
    """68-landmark -> 7-landmark reduction (eye corners, nose, mouth)."""
    return np.asarray(lmk, float)[..., _LMK68_TO_7, :]


def face_center_dist(lmk: np.ndarray) -> Tuple[int, int, float]:
    """(cx, cy, eye-mouth distance); 68- or 7-landmark layouts
    (ref:pylib/FacePts.py:76-90)."""
    lmk = np.asarray(lmk, float)
    if lmk.shape[0] == 68:
        eyec = lmk[36:48].mean(axis=0)
        mouc = lmk[48:60].mean(axis=0)
    else:
        eyec = lmk[0:4].mean(axis=0)
        mouc = lmk[5:7].mean(axis=0)
    dist = float(np.linalg.norm(eyec - mouc))
    return int((eyec[0] + mouc[0]) / 2), int((eyec[1] + mouc[1]) / 2), dist


def lmk_to_bbox(lmk: np.ndarray, dist_ratio: float) -> Tuple[int, int, int, int]:
    """(left, top, right, bottom) square box around the face center
    (ref:pylib/FacePts.py:92-96)."""
    cx, cy, dist = face_center_dist(lmk)
    sl = int(dist * dist_ratio)
    return (cx - sl // 2, cy - sl // 2, cx + sl // 2, cy + sl // 2)


def lmk_to_resmap_labels(lmk, shape, radius: float) -> np.ndarray:
    """Single-channel label map: disk of value l+1 per landmark
    (ref:pylib/FacePts.py:113-123). Later disks overwrite earlier ones."""
    from PIL import Image, ImageDraw

    im = Image.new("L", tuple(shape))
    draw = ImageDraw.Draw(im)
    for l, (x, y) in enumerate(np.asarray(lmk, float)):
        draw.ellipse((x - radius, y - radius, x + radius, y + radius), fill=l + 1)
    return np.asarray(im)


def resmap_labels_to_lmk(resmap: np.ndarray, n_lmk: int) -> np.ndarray:
    """Centroid decode of a label map, 1-indexed output
    (ref:pylib/FacePts.py:125-135)."""
    out = np.zeros((n_lmk, 2))
    for l in range(n_lmk):
        ys, xs = np.where(resmap == l + 1)
        if ys.size:
            out[l] = [xs.mean() + 1, ys.mean() + 1]
    return out


def circle_size(base_size: float = 4, scale: float = 1) -> float:
    """Scale-adaptive disk radius, clamped to +/-2 of base
    (ref:pylib/FacePts.py:149-153)."""
    size = np.round(base_size / scale)
    if size < base_size - 2:
        size = base_size - 2
    if size > base_size + 2:
        size = base_size + 2
    return size


# --------------------------------------------------------------------------
# decode variants + component NME + segmentation metrics (ref:pylib/FaceAcc.py)
# --------------------------------------------------------------------------


def heatmap2pts_variants(output: np.ndarray):
    """(raw argmax, quarter-pixel-refined, refined+0.5) 1-indexed coords,
    NHWC input (ref:pylib/FaceAcc.py:112-131)."""
    coords0 = get_preds(output)
    refined_plus_half = quarter_pixel_refine(output, coords0)
    coords1 = refined_plus_half - 0.5  # the pre-+0.5 variant
    return coords0, coords1, refined_plus_half


_NME_COMPONENTS_68 = {"le": slice(36, 42), "re": slice(42, 48),
                      "ns": slice(27, 36), "mt": slice(48, 68)}
_NME_COMPONENTS_7 = {"le": slice(0, 2), "re": slice(2, 4),
                     "ns": slice(4, 5), "mt": slice(5, 7)}


def per_image_nme_components(pred: np.ndarray, ann: np.ndarray):
    """(overall, left-eye, right-eye, nose, mouth) NME arrays
    (ref:pylib/FaceAcc.py:81-110)."""
    n, L = pred.shape[0], pred.shape[1]
    comps = _NME_COMPONENTS_68 if L == 68 else _NME_COMPONENTS_7
    a, b = (36, 45) if L == 68 else (0, 3)
    out = {k: np.zeros(n) for k in ["all", "le", "re", "ns", "mt"]}
    for i in range(n):
        inter = np.linalg.norm(ann[i, a] - ann[i, b])
        d = np.linalg.norm(pred[i] - ann[i], axis=1)
        out["all"][i] = d.sum() / (inter * L)
        for k, sl in comps.items():
            out[k][i] = d[sl].sum() / (inter * (sl.stop - sl.start))
    return out["all"], out["le"], out["re"], out["ns"], out["mt"]


def per_class_f1score(output: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Per-channel F1 over thresholded sigmoid maps, NHWC
    (ref:pylib/FaceAcc.py:10-34 semantics incl. the skip-counting)."""
    assert output.shape == target.shape
    n, _, _, c = output.shape
    f1 = np.zeros(c)
    counter = np.full(c, float(n))
    for i in range(n):
        for j in range(c):
            pred_mask = output[i, :, :, j] > 0.5
            grnd_total = target[i, :, :, j].sum()
            pred_total = pred_mask.sum()
            if grnd_total == 0:
                counter[j] -= 1
                continue
            if pred_total == 0:
                continue
            correct = target[i, :, :, j][pred_mask].sum()
            recall = correct / grnd_total
            precision = correct / pred_total
            if precision + recall == 0:
                continue
            f1[j] += 2 * precision * recall / (precision + recall)
    with np.errstate(invalid="ignore"):
        return f1 / counter  # NaN where no ground truth exists (ref behavior)


def per_class_accuracy(output: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Mean per-class pixel accuracy of argmax segmentation, NHWC output
    vs NHW class-label target (ref:pylib/FaceAcc.py:36-61)."""
    n, _, _, c = output.shape
    pred = np.argmax(output, axis=3)
    acc = np.zeros(c)
    for b in range(n):
        for cls in range(c):
            idx = target[b] == cls
            if idx.sum() == 0:
                continue
            acc[cls] += (pred[b][idx] == cls).mean()
    return acc / n
