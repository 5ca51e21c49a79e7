"""Data pipeline tests: crop geometry, dataset semantics on JSON fixtures,
loader batching + device prefetch."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from cunet_tpu.data import (
    DataLoader,
    FaceDataset,
    MPIIDataset,
    SyntheticLandmarkDataset,
    collate,
    crop,
    prefetch_to_device,
    sample_from_bounded_gaussian,
)


@pytest.fixture
def img_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(0)
    arr = (rs.rand(300, 400, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    return d


def _mpii_json(tmp_path, n_train=3, n_val=2):
    anno = []
    for i in range(n_train + n_val):
        anno.append(
            {
                "dataset": "MPII",
                "isValidation": i >= n_train,
                "img_paths": "a.png",
                "objpos": [200, 150],
                "scale_provided": 1.0,
                "normalizer": 50.0,
                "joint_self": [[100.0 + j, 120.0 + j, 1.0] for j in range(16)],
            }
        )
    # a non-MPII entry must be ignored entirely
    anno.append({"dataset": "LEEDS", "isValidation": False, "img_paths": "a.png",
                 "objpos": [10, 10], "scale_provided": 1.0, "normalizer": 1.0,
                 "joint_self": [[5.0, 5.0, 1.0]] * 16})
    p = tmp_path / "mpii.json"
    p.write_text(json.dumps(anno))
    return str(p)


class TestCrop:
    def test_output_shape_and_range(self, img_dir):
        img = np.asarray(Image.open(img_dir / "a.png"), np.float32) / 255
        out = crop(img, [200, 150], 1.0, 0, 256)
        assert out.shape == (256, 256, 3)
        assert out.dtype == np.float32
        assert 0 <= out.min() and out.max() <= 1

    def test_center_pixel_preserved(self, img_dir):
        """The crop center must map to the output center (res/2)."""
        img = np.zeros((300, 400, 3), np.float32)
        img[150, 200] = 1.0  # bright pixel at the requested center
        out = crop(img, [200, 150], 0.64, 0, 256)  # window 128px -> 2x zoom
        cy, cx = np.unravel_index(np.argmax(out[:, :, 0]), out.shape[:2])
        assert abs(cx - 128) <= 2 and abs(cy - 128) <= 2

    def test_rotation_moves_offcenter_pixel(self):
        img = np.zeros((300, 400, 3), np.float32)
        img[150, 260] = 1.0  # right of center
        out = crop(img, [200, 150], 1.0, 90, 256)
        cy, cx = np.unravel_index(np.argmax(out[:, :, 0]), out.shape[:2])
        # 90deg CCW rotation about the center: right -> below center... the
        # point ends on the vertical axis
        assert abs(cx - 128) <= 4
        assert abs(cy - 128) > 30

    def test_zoomed_out_preshrink_path(self, img_dir):
        img = np.asarray(Image.open(img_dir / "a.png"), np.float32) / 255
        out = crop(img, [200, 150], 3.0, 15, 256)  # scale_factor >= 2 path
        assert out.shape == (256, 256, 3)


class TestBoundedGaussian:
    def test_clamped(self):
        rng = np.random.RandomState(0)
        vals = [sample_from_bounded_gaussian(0.25, rng) for _ in range(500)]
        assert all(-0.5 <= v <= 0.5 for v in vals)
        assert np.std(vals) > 0.1


class TestMPIIDataset:
    def test_split_and_sample(self, tmp_path, img_dir):
        jf = _mpii_json(tmp_path)
        train = MPIIDataset(jf, str(img_dir), is_train=True, seed=0)
        val = MPIIDataset(jf, str(img_dir), is_train=False, seed=0)
        assert len(train) == 3 and len(val) == 2

        s = val[0]  # deterministic (no augmentation)
        assert s["image"].shape == (256, 256, 3)
        assert s["heatmap"].shape == (64, 64, 16)
        # MPII fixups: c_y += 15*s, s *= 1.25, normalizer * 0.6
        assert s["center"][1] == 150 + 15 * 1.0
        assert np.isclose(s["scale"], 1.25)
        assert np.isclose(s["normalizer"], 30.0)
        assert s["heatmap"].max() == 1.0  # joints render

    def test_train_augmentation_varies(self, tmp_path, img_dir):
        jf = _mpii_json(tmp_path)
        ds = MPIIDataset(jf, str(img_dir), is_train=True, seed=1)
        a, b = ds[0], ds[0]
        assert not np.allclose(a["image"], b["image"])  # stochastic aug

    def test_val_deterministic(self, tmp_path, img_dir):
        jf = _mpii_json(tmp_path)
        ds = MPIIDataset(jf, str(img_dir), is_train=False, seed=1)
        a, b = ds[0], ds[0]
        np.testing.assert_array_equal(a["image"], b["image"])


class TestFaceDataset:
    def test_split_and_scaling(self, tmp_path, img_dir):
        anno = []
        for i, tag in enumerate(["300w", "300w", "ibug", "300w_cropped"]):
            anno.append(
                {
                    "dataset": tag,
                    "isValidation": i == 1,
                    "img_paths": "a.png",
                    "pts_paths": "missing.pts",
                    "objpos_det": [200, 150],
                    "scale_provided_det": 1.0,
                    "pts": [[100.0 + j, 120.0 + j] for j in range(68)],
                }
            )
        jf = tmp_path / "face.json"
        jf.write_text(json.dumps(anno))
        train = FaceDataset(str(jf), str(img_dir), is_train=True)
        val = FaceDataset(str(jf), str(img_dir), is_train=False)
        # 300w_cropped dropped; val = isValidation or ibug
        assert len(train) == 1 and len(val) == 2
        s = val[0]
        assert np.isclose(s["scale"], 1.1)  # s = scale_provided_det * 1.1
        assert s["heatmap"].shape == (64, 64, 68)
        assert s["pts_input_res"].shape == (68, 2)


class TestLoader:
    def test_collate_and_len(self):
        ds = SyntheticLandmarkDataset(length=10, inp_res=32, out_res=8, num_joints=4)
        dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
        assert len(dl) == 2
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0]["image"].shape == (4, 32, 32, 3)
        assert batches[0]["heatmap"].shape == (4, 8, 8, 4)

    def test_threaded_matches_serial(self):
        ds = SyntheticLandmarkDataset(length=8, inp_res=32, out_res=8, num_joints=4)
        a = list(DataLoader(ds, batch_size=4, num_threads=0, seed=3, shuffle=True))
        b = list(DataLoader(ds, batch_size=4, num_threads=3, seed=3, shuffle=True))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["image"], y["image"])

    def test_prefetch_to_device(self):
        import jax

        ds = SyntheticLandmarkDataset(length=8, inp_res=32, out_res=8, num_joints=4)
        dl = DataLoader(ds, batch_size=4)
        got = list(prefetch_to_device(iter(dl), depth=2))
        assert len(got) == 2
        assert isinstance(got[0]["image"], jax.Array)
        np.testing.assert_allclose(
            np.asarray(got[0]["image"]), list(dl)[0]["image"], atol=1e-7
        )
