"""300-W face landmark dataset (JSON-annotation driven).

Behavioral rebuild of ref:data/face_bbx.py:

- split: drop ``300w_cropped``; val = ``isValidation or dataset == 'ibug'``
  (ref :33-38);
- geometry: ``s = scale_provided_det * 1.1``, ``c = objpos_det`` (ref :95-96);
- NO horizontal flip augmentation (commented out in the reference, :111-115);
- landmark targets computed at INPUT resolution then scaled by out/in
  (ref :129-131) — different from MPII's direct out-res transform;
- landmarks come from ``.txt``/``.pts`` sidecar files cross-checked against
  the JSON (ref :88-94); here the JSON ``pts`` field is authoritative and the
  sidecar (when present) is cross-checked the same way.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from cunet_tpu.data.augment import (
    color_jitter,
    crop_host,
    load_image,
    render_heatmaps_host,
    sample_from_bounded_gaussian,
)
from cunet_tpu.geometry import transform_pts_int


def pts_file_to_landmarks(fname: str) -> np.ndarray:
    """Parse a 300-W ``.pts`` file: 3 header lines, trailing '}'
    (ref:pylib/FacePts.py:53-56)."""
    return np.genfromtxt(fname, delimiter=" ", skip_header=3, skip_footer=1)


class FaceDataset:
    def __init__(
        self,
        jsonfile: str,
        img_folder: str,
        inp_res: int = 256,
        out_res: int = 64,
        is_train: bool = True,
        sigma: float = 1.0,
        scale_factor: float = 0.25,
        rot_factor: float = 30.0,
        std_size: int = 200,
        seed: Optional[int] = None,
        native_crop: bool = False,
    ):
        self.img_folder = img_folder
        self.inp_res = inp_res
        self.out_res = out_res
        self.is_train = is_train
        self.sigma = sigma
        self.scale_factor = scale_factor
        self.rot_factor = rot_factor
        self.std_size = std_size
        self.rng = np.random.RandomState(seed)
        self.native_crop = native_crop

        with open(jsonfile) as f:
            self.anno = json.load(f)
        self.train_ids, self.valid_ids = [], []
        for idx, val in enumerate(self.anno):
            if val["dataset"] != "300w_cropped":
                if val["isValidation"] or val["dataset"] == "ibug":
                    self.valid_ids.append(idx)
                else:
                    self.train_ids.append(idx)

    def __len__(self) -> int:
        return len(self.train_ids if self.is_train else self.valid_ids)

    def _load_pts(self, a) -> np.ndarray:
        pts = np.asarray(a["pts"], np.float64)
        pts_path = os.path.join(self.img_folder, a.get("pts_paths", ""))
        if pts_path.endswith(".txt") and os.path.exists(pts_path):
            file_pts = np.loadtxt(pts_path)
            assert np.sum(file_pts - pts) == 0, f"pts mismatch: {pts_path}"
        elif pts_path.endswith(".pts") and os.path.exists(pts_path):
            file_pts = pts_file_to_landmarks(pts_path)
            assert np.sum(file_pts - pts) == 0, f"pts mismatch: {pts_path}"
        return pts

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        ids = self.train_ids if self.is_train else self.valid_ids
        a = self.anno[ids[index]]

        img = load_image(os.path.join(self.img_folder, a["img_paths"]))
        pts = self._load_pts(a)
        s = float(a["scale_provided_det"]) * 1.1
        c = np.asarray(a["objpos_det"], np.float64).copy()

        r = 0.0
        if self.is_train:
            s = s * (2 ** sample_from_bounded_gaussian(self.scale_factor, self.rng))
            r = sample_from_bounded_gaussian(self.rot_factor, self.rng)
            if self.rng.uniform(0, 1) <= 0.6:
                r = 0.0
            img = color_jitter(img, self.rng)

        inp = crop_host(img, c, s, r, self.inp_res, self.std_size, native=self.native_crop)
        pts_input_res = transform_pts_int(pts, c, s, r, self.inp_res, self.std_size)
        pts_aug = pts_input_res * (1.0 * self.out_res / self.inp_res)
        heatmap = render_heatmaps_host(pts_aug, self.out_res, self.out_res, self.sigma)

        return {
            "image": inp.astype(np.float32),
            "heatmap": heatmap,
            "pts_input_res": pts_input_res.astype(np.float32),
            "pts": pts.astype(np.float32),
            "center": c.astype(np.float32),
            "scale": np.float32(s),
            "rot": np.float32(r),
            "index": np.int32(index),
        }
