"""Golden-value tests for geometry, heatmap rendering, and decode metrics."""

import numpy as np
import pytest

from cunet_tpu.evaluation import (
    MPII_TRAIN_IDX,
    accuracy,
    calc_dists,
    dist_acc,
    get_preds,
    pckh_table,
    per_image_nme,
    quarter_pixel_refine,
)
from cunet_tpu.geometry import (
    FACE_FLIP_PAIRS,
    MPII_FLIP_PAIRS,
    flip_channels,
    flip_test_merge,
    get_transform,
    shuffle_flip_pairs,
    shufflelr,
    transform_preds_1indexed,
    transform_pts,
)
from cunet_tpu.ops.heatmap import render_heatmaps, render_heatmaps_np


def _paste_gaussian_oracle(pts, h, w, sigma=1.0):
    """Reference-style paste implementation (ref:pylib/HumanPts.py:49-76
    semantics) used as an independent oracle."""
    tmp = int(np.ceil(3 * sigma))
    out = np.zeros((h, w, len(pts)), np.float32)
    size = 2 * tmp + 1
    x = np.arange(size, dtype=float)
    y = x[:, None]
    x0 = y0 = size // 2
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / tmp**2)
    for i, pt in enumerate(pts):
        if pt[0] <= 0 or pt[1] <= 0:
            continue
        ul = [int(pt[0] - tmp), int(pt[1] - tmp)]
        br = [int(pt[0] + tmp), int(pt[1] + tmp)]
        if ul[0] >= w or ul[1] >= h or br[0] < 0 or br[1] < 0:
            continue
        gx = max(0, -ul[0]), min(br[0] + 1, w) - max(0, ul[0]) + max(0, -ul[0])
        gy = max(0, -ul[1]), min(br[1] + 1, h) - max(0, ul[1]) + max(0, -ul[1])
        ix = max(0, ul[0]), min(br[0] + 1, w)
        iy = max(0, ul[1]), min(br[1] + 1, h)
        out[iy[0]:iy[1], ix[0]:ix[1], i] = g[gy[0]:gy[1], gx[0]:gx[1]]
    return out


class TestHeatmapRender:
    @pytest.mark.parametrize(
        "pts",
        [
            [[10, 12], [3, 3], [0, 5], [5, 0]],          # includes invalid pts
            [[1, 1], [63, 63], [62, 2], [2, 62]],        # window clipped at edges
            [[-4, -4], [70, 70], [63, 1]],               # fully out / boundary
            [[2.5, 2.5], [10.75, 40.2], [0.5, 30]],      # fractional coords
            [[1.5, 1.5], [2.9, 50.0]],                   # frac in (0,3): trunc shift
        ],
    )
    def test_matches_paste_oracle(self, pts):
        pts = np.array(pts, float)
        got = render_heatmaps_np(pts, 64, 64)
        want = _paste_gaussian_oracle(pts, 64, 64)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_jnp_matches_np(self):
        pts = np.array([[10, 12], [3, 3], [0, 5], [63, 63], [2.5, 2.5], [1.5, 40.2]], float)
        got = np.asarray(render_heatmaps(pts, 64, 64))
        want = render_heatmaps_np(pts, 64, 64)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_peak_is_one_and_denominator(self):
        hm = render_heatmaps_np(np.array([[20, 30]], float), 64, 64)[:, :, 0]
        assert hm[30, 20] == 1.0
        # unnormalized gaussian with (3*sigma)^2 denominator (ref quirk):
        assert np.isclose(hm[30, 21], np.exp(-1 / 9))
        # hard zero outside the 7x7 window
        assert hm[30, 24] == 0.0
        assert hm[30, 23] > 0


class TestGetPreds:
    def test_one_indexed_argmax(self):
        hm = np.zeros((1, 8, 8, 2), np.float32)
        hm[0, 3, 5, 0] = 1.0   # (x=5, y=3) 0-indexed
        hm[0, 0, 0, 1] = 0.7
        preds = get_preds(hm)
        np.testing.assert_array_equal(preds[0, 0], [6, 4])  # 1-indexed
        np.testing.assert_array_equal(preds[0, 1], [1, 1])

    def test_nonpositive_max_zeroed(self):
        hm = -np.ones((1, 8, 8, 1), np.float32)
        preds = get_preds(hm)
        np.testing.assert_array_equal(preds[0, 0], [0, 0])


class TestQuarterPixel:
    def test_shift_toward_larger_neighbor(self):
        hm = np.zeros((1, 8, 8, 1), np.float32)
        hm[0, 4, 4, 0] = 1.0
        hm[0, 4, 5, 0] = 0.6   # right neighbor larger than left (0)
        hm[0, 3, 4, 0] = 0.2   # top neighbor larger than bottom (0)... y grows down
        coords = get_preds(hm)          # (5, 5) 1-indexed
        out = quarter_pixel_refine(hm, coords)
        # dx = hm[y, x+1] - hm[y, x-1] = 0.6 > 0 -> +0.25; +0.5 offset after
        assert out[0, 0, 0] == 5 + 0.25 + 0.5
        # dy = hm[y+1, x] - hm[y-1, x] = 0 - 0.2 < 0 -> -0.25
        assert out[0, 0, 1] == 5 - 0.25 + 0.5

    def test_border_not_refined(self):
        hm = np.zeros((1, 8, 8, 1), np.float32)
        hm[0, 0, 0, 0] = 1.0
        coords = get_preds(hm)  # (1, 1): px == 1 -> no refinement
        out = quarter_pixel_refine(hm, coords)
        np.testing.assert_array_equal(out[0, 0], [1.5, 1.5])


class TestDistsAcc:
    def test_calc_dists_sentinel(self):
        preds = np.array([[[3.0, 4.0], [1.0, 1.0]]])
        target = np.array([[[0.0, 0.0], [4.0, 5.0]]])
        d = calc_dists(preds, target, np.array([5.0]))
        assert d[0, 0] == -1          # target at (0,0) -> invisible
        assert np.isclose(d[1, 0], 5 / 5)

    def test_dist_acc(self):
        dists = np.array([0.1, 0.6, -1.0, 0.5])
        # valid: 0.1, 0.6, 0.5; <= 0.5: 0.1, 0.5 -> 2/3
        assert np.isclose(dist_acc(dists), 2 / 3)
        assert dist_acc(np.array([-1.0, -1.0])) == -1

    def test_accuracy_perfect(self):
        hm = np.random.RandomState(0).rand(2, 64, 64, 16).astype(np.float32)
        acc = accuracy(hm, hm, MPII_TRAIN_IDX)
        assert np.isclose(acc[0], 1.0)
        assert all(np.isclose(a, 1.0) for a in acc[1:])

    def test_pckh_table_keys(self):
        pred = np.random.RandomState(0).rand(4, 16, 2) * 60
        table = pckh_table(pred, pred, np.ones(4))
        assert np.isclose(table["Average"], 1.0)
        assert set(table) == {
            "Head", "Knee", "Ankle", "Shoulder", "Elbow", "Wrist", "Hip", "Average"
        }


class TestNME:
    def test_68_interocular(self):
        ann = np.zeros((1, 68, 2))
        ann[0, 36] = [0, 0]
        ann[0, 45] = [30, 40]  # interocular = 50
        pred = ann.copy()
        pred[:, :, 0] += 1.0   # every landmark off by 1 px
        nme = per_image_nme(pred, ann)
        assert np.isclose(nme[0], 68 * 1.0 / (50 * 68))


class TestGeometry:
    def test_center_maps_to_crop_center(self):
        t = get_transform([100, 80], 1.5, 0, 256)
        p = t @ np.array([100, 80, 1.0])
        np.testing.assert_allclose(p[:2], [128, 128])

    def test_transform_roundtrip(self):
        pts = np.array([[10.0, 20.0], [200.0, 150.0]])
        fwd = transform_pts(pts, [100, 80], 1.2, 30, 256)
        back = transform_pts(fwd, [100, 80], 1.2, 30, 256, invert=True)
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_scale_semantics(self):
        # window side = size*scale px maps onto res px
        t = get_transform([0, 0], 2.0, 0, 256, size=200)
        assert np.isclose(t[0, 0], 256 / 400)

    def test_transform_preds_1indexed_identity(self):
        # identity crop: res=size=200, scale=1, center at crop center
        coords = np.array([[5.0, 7.0]])
        out = transform_preds_1indexed(coords, np.array([100.0, 100.0]), 1.0, 0.0, 200)
        np.testing.assert_array_equal(out, [[5, 7]])

    def test_flip_merge_identity_for_symmetric(self):
        hm = np.random.RandomState(0).rand(1, 8, 8, 16)
        sym = (hm + shuffle_flip_pairs(flip_channels(hm), MPII_FLIP_PAIRS)) / 2
        merged = flip_test_merge(sym, flip_channels(
            shuffle_flip_pairs(sym, MPII_FLIP_PAIRS)), MPII_FLIP_PAIRS)
        np.testing.assert_allclose(merged, sym, atol=1e-12)

    def test_shufflelr_involution(self):
        pts = np.random.RandomState(0).rand(68, 2) * 100
        out = shufflelr(shufflelr(pts, 100, FACE_FLIP_PAIRS), 100, FACE_FLIP_PAIRS)
        np.testing.assert_allclose(out, pts)

    def test_flip_pairs_are_disjoint(self):
        for pairs, n in [(MPII_FLIP_PAIRS, 16), (FACE_FLIP_PAIRS, 68)]:
            flat = pairs.flatten()
            assert len(set(flat.tolist())) == len(flat)
            assert flat.max() < n


class TestDrawLabelmap:
    def test_normalized_gaussian_variant(self):
        from cunet_tpu.ops.heatmap import draw_labelmap_np

        img = np.zeros((32, 32), np.float32)
        out = draw_labelmap_np(img, (10, 12), sigma=2)
        assert out[12, 10] == 1.0
        # conventional 2*sigma^2 denominator (unlike the main renderer)
        assert np.isclose(out[12, 11], np.exp(-1 / 8))
        # out-of-bounds point leaves the image untouched
        np.testing.assert_array_equal(draw_labelmap_np(img, (100, 100), 2), img)

    def test_cauchy_kernel(self):
        from cunet_tpu.ops.heatmap import draw_labelmap_np

        out = draw_labelmap_np(np.zeros((32, 32), np.float32), (10, 12), 2, "cauchy")
        assert np.isclose(out[12, 10], 2 / (4**1.5))
