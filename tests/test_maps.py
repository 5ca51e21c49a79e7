"""Tests for auxiliary maps, face utilities, and file IO."""

import numpy as np
import pytest

from cunet_tpu.evaluation.maps import (
    face_center_dist,
    heatmap2pts_variants,
    lmk68_to_7,
    lmk_to_bbox,
    lmk_to_resmap_labels,
    per_class_accuracy,
    per_class_f1score,
    per_image_nme_components,
    pts2heatmap_part,
    pts2resmap,
    pts2resmap_body_part,
    resmap_labels_to_lmk,
    weights_from_grnd_maps,
)
from cunet_tpu.utils.fileio import (
    LoggerMonitor,
    list_files,
    read_floats,
    read_lines,
    write_lines,
)


class TestPartMaps:
    def test_part_heatmap_midpoints(self):
        pts = np.zeros((16, 2))
        pts[0] = [10, 10]
        pts[1] = [14, 10]  # pair (0,1) -> midpoint (12, 10)
        hm = pts2heatmap_part(pts, (32, 32))
        assert hm.shape == (32, 32, 10)
        assert hm[10, 12, 0] == 1.0
        assert hm[:, :, 2].max() == 0  # pair (3,4) both at origin -> skipped

    def test_resmap_disk(self):
        pts = np.array([[8, 8], [0, 5], [40, 5]])
        rm, valid = pts2resmap(pts, (16, 16), radius=2)
        assert rm[8, 8, 0] == 1 and rm[8, 10, 0] == 1 and rm[8, 11, 0] == 0
        assert rm[:, :, 1].sum() == 0  # x <= 0 skipped
        assert rm[:, :, 2].sum() == 0  # x > W skipped
        np.testing.assert_array_equal(valid[1], [0, 0])

    def test_body_part_resmap(self):
        pts = np.zeros((16, 2))
        pts[12], pts[13] = [20, 20], [40, 20]   # shoulders
        pts[2], pts[3] = [22, 50], [38, 50]     # hips
        pts[8], pts[9] = [30, 8], [30, 16]      # head
        rm = pts2resmap_body_part(pts, (64, 64), ann_size=2.0)
        assert rm.shape == (64, 64, 10)
        assert rm[:, :, 8].sum() > 0            # head ellipse drawn
        assert rm[:, :, 9].sum() > 0            # torso polygon filled
        assert rm[35, 30, 9] == 1               # inside torso quad

    def test_weight_map(self):
        maps = np.zeros((8, 8, 1), np.float32)
        maps[0, 0, 0] = 1.0
        w = weights_from_grnd_maps(maps, fgrnd_weight=1, bgrnd_weight=1)
        assert w[0, 0, 0] == 63  # int((64-1)/1 * 1)
        assert w[1, 1, 0] == 1


class TestFaceUtils:
    def test_lmk68_to_7(self):
        lmk = np.arange(68 * 2).reshape(68, 2).astype(float)
        out = lmk68_to_7(lmk)
        np.testing.assert_array_equal(out[0], lmk[36])  # 37-1
        np.testing.assert_array_equal(out[6], lmk[54])  # 55-1

    def test_center_and_bbox(self):
        lmk = np.zeros((68, 2))
        lmk[36:48] = [10, 10]   # eyes
        lmk[48:60] = [10, 40]   # mouth
        cx, cy, dist = face_center_dist(lmk)
        assert (cx, cy) == (10, 25) and np.isclose(dist, 30)
        l, t, r, b = lmk_to_bbox(lmk, 2.0)
        assert r - l == 60

    def test_resmap_labels_roundtrip(self):
        lmk = np.array([[10.0, 12.0], [30.0, 7.0]])
        labels = lmk_to_resmap_labels(lmk, (40, 40), radius=2)
        back = resmap_labels_to_lmk(labels, 2)
        np.testing.assert_allclose(back, lmk + 1, atol=0.6)  # 1-indexed decode

    def test_nme_components(self):
        ann = np.random.RandomState(0).rand(2, 68, 2) * 100
        allv, le, re, ns, mt = per_image_nme_components(ann, ann)
        assert np.allclose(allv, 0) and np.allclose(mt, 0)

    def test_heatmap2pts_variants(self):
        hm = np.zeros((1, 8, 8, 1), np.float32)
        hm[0, 4, 4, 0] = 1.0
        c0, c1, c2 = heatmap2pts_variants(hm)
        np.testing.assert_array_equal(c0[0, 0], [5, 5])
        np.testing.assert_allclose(c2 - c1, 0.5)


class TestSegMetrics:
    def test_f1_perfect(self):
        t = np.zeros((1, 8, 8, 2), np.float32)
        t[0, 2:4, 2:4, 0] = 1
        f1 = per_class_f1score(t, t)
        assert np.isclose(f1[0], 1.0)
        assert np.isnan(f1[1])  # no ground truth anywhere -> counter 0

    def test_per_class_accuracy(self):
        out = np.zeros((1, 4, 4, 2), np.float32)
        out[0, :, :, 1] = 1.0  # predict class 1 everywhere
        target = np.ones((1, 4, 4), int)
        acc = per_class_accuracy(out, target)
        assert acc[1] == 1.0 and acc[0] == 0.0


class TestFileIO:
    def test_lines_roundtrip(self, tmp_path):
        p = str(tmp_path / "l.txt")
        write_lines(p, ["a", "b"])
        assert read_lines(p) == ["a", "b"]

    def test_read_floats(self, tmp_path):
        p = str(tmp_path / "f.txt")
        write_lines(p, ["1.5 2.5", "3 4"])
        np.testing.assert_array_equal(read_floats(p), [[1.5, 2.5], [3, 4]])

    def test_list_files(self, tmp_path):
        (tmp_path / "a.json").write_text("{}")
        (tmp_path / "b.txt").write_text("")
        assert len(list_files(str(tmp_path), ".json")) == 1

    def test_logger_monitor_plot(self, tmp_path):
        from cunet_tpu.utils.logger import TsvLogger

        p = str(tmp_path / "summary.txt")
        lg = TsvLogger(p)
        lg.set_names(["epoch", "val_metric"])
        lg.append([1, 0.5])
        lg.append([2, 0.7])
        lg.close()
        mon = LoggerMonitor({"exp1": p})
        assert mon.numbers()["exp1"]["val_metric"] == [0.5, 0.7]
        out = mon.plot(str(tmp_path / "cmp.png"))
        import os

        assert os.path.exists(out)
