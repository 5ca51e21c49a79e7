"""Native host library tests: build, heatmap bit-parity, warp correctness."""

import numpy as np
import pytest

from cunet_tpu.data.native import (
    affine_crop_native,
    crop_fast,
    native_available,
    render_heatmaps_native,
)
from cunet_tpu.geometry import get_transform
from cunet_tpu.ops.heatmap import render_heatmaps_np

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native lib unavailable (no g++?)"
)


class TestNativeHeatmaps:
    @pytest.mark.parametrize(
        "pts",
        [
            [[10, 12], [3, 3], [0, 5], [5, 0]],
            [[1, 1], [63, 63], [62, 2], [2, 62]],
            [[2.5, 2.5], [10.75, 40.2], [-4, -4], [70, 70]],
        ],
    )
    def test_bit_parity_with_python(self, pts):
        pts = np.array(pts, float)
        got = render_heatmaps_native(pts, 64, 64)
        want = render_heatmaps_np(pts, 64, 64)
        np.testing.assert_array_equal(got, want)


class TestNativeCrop:
    def test_identity_warp(self):
        img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
        out = affine_crop_native(img, np.eye(3), 64)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_translation_zero_pad(self):
        img = np.ones((16, 16, 1), np.float32)
        inv_t = np.eye(3)
        inv_t[0, 2] = -8  # crop x -> src x - 8: right half samples outside
        out = affine_crop_native(img, inv_t, 16)
        assert out[0, 0, 0] == 0.0   # maps to src x=-8
        assert out[0, 15, 0] == 1.0  # maps to src x=7

    def test_bilinear_halfpixel(self):
        img = np.zeros((4, 4, 1), np.float32)
        img[1, 1, 0] = 1.0
        inv_t = np.eye(3)
        inv_t[0, 2] = 0.5  # sample halfway between columns
        out = affine_crop_native(img, inv_t, 4)
        assert np.isclose(out[1, 0, 0], 0.5)  # (0.5, 1) -> half of img[1,1]
        assert np.isclose(out[1, 1, 0], 0.5)

    def test_crop_fast_matches_pil_path_roughly(self):
        """Float warp vs the PIL compat crop: same geometry, small resample
        differences (uint8 round-trip in the compat path)."""
        from cunet_tpu.data.augment import crop

        # smooth image: PIL's resize antialiases when downscaling, the native
        # warp point-samples — high-frequency content diverges by design, so
        # compare on low-frequency content
        ys, xs = np.mgrid[0:200, 0:260]
        img = np.stack(
            [np.sin(xs / 30) * 0.5 + 0.5, np.cos(ys / 25) * 0.5 + 0.5,
             (xs + ys) / 460.0], axis=-1,
        ).astype(np.float32)
        center, scale, rot = [130, 100], 0.9, 20.0
        a = crop_fast(img, center, scale, rot, 128)
        b = crop(img, center, scale, rot, 128)
        # interior agreement (borders differ: PIL rotate corners vs warp pad)
        diff = np.abs(a[32:96, 32:96] - b[32:96, 32:96])
        assert np.median(diff) < 0.02
        assert diff.mean() < 0.05

    def test_center_invariant(self):
        img = np.zeros((300, 400, 3), np.float32)
        img[150, 200] = 1.0
        out = crop_fast(img, [200, 150], 0.64, 0, 256)
        cy, cx = np.unravel_index(np.argmax(out[:, :, 0]), out.shape[:2])
        assert abs(cx - 128) <= 2 and abs(cy - 128) <= 2
