"""On-device affine warp tests vs the native C++ warp and PIL compat crop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.geometry import get_transform
from cunet_tpu.ops.affine import affine_warp, crop_on_device, render_batch_heatmaps


class TestAffineWarp:
    def test_identity(self):
        img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3).astype(np.float32))
        out = affine_warp(img, jnp.eye(3), 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_zero_padding(self):
        img = jnp.ones((8, 8, 1), jnp.float32)
        t = jnp.asarray(np.array([[1, 0, -4], [0, 1, 0], [0, 0, 1]], np.float32))
        out = affine_warp(img, t, 8)
        assert np.asarray(out)[0, 0, 0] == 0.0   # samples src x=-4
        assert np.asarray(out)[0, 7, 0] == 1.0

    def test_matches_native_warp(self):
        from cunet_tpu.data.native import affine_crop_native, native_available

        if not native_available():
            pytest.skip("no native lib")
        rs = np.random.RandomState(1)
        img = rs.rand(40, 50, 3).astype(np.float32)
        t = np.linalg.inv(get_transform([25, 20], 0.2, 15.0, 32))
        got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(t, jnp.float32), 32))
        want = affine_crop_native(img, t, 32)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_batched_crop_center(self):
        imgs = np.zeros((2, 64, 64, 3), np.float32)
        imgs[0, 32, 32] = 1.0
        imgs[1, 16, 48] = 1.0
        out = crop_on_device(
            jnp.asarray(imgs),
            centers=np.array([[32, 32], [48, 16]], np.float32),
            scales=np.array([0.16, 0.16], np.float32),  # 32px window -> 32 out
            rots=np.zeros(2, np.float32),
            out_res=32,
        )
        for i in range(2):
            cy, cx = np.unravel_index(np.argmax(np.asarray(out)[i, :, :, 0]), (32, 32))
            assert abs(cx - 16) <= 1 and abs(cy - 16) <= 1

    def test_batched_heatmaps(self):
        pts = jnp.asarray(np.array([[[10, 12], [3, 3]], [[5, 5], [0, 1]]], np.float32))
        hm = render_batch_heatmaps(pts, 16)
        assert hm.shape == (2, 16, 16, 2)
        assert np.asarray(hm)[0, 12, 10, 0] == 1.0
        assert np.asarray(hm)[1].max() == 1.0
        assert np.asarray(hm)[1, :, :, 1].max() == 0.0  # invalid pt
