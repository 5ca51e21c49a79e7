"""MPII / LSP landmark dataset (JSON-annotation driven).

Behavioral rebuild of ref:data/mpii_for_mpii_22.py. Samples are dicts of
numpy arrays (NHWC-ready, channels-last); a plain ``__getitem__`` protocol so
any loader can wrap it. Per-sample semantics (metric-affecting, preserved):

- split: only ``dataset == 'MPII'`` entries; val = ``isValidation``
  (ref :34-43); LEEDS entries train-only via the same loop when present;
- MPII fixups: ``c_y += 15*s``, ``s *= 1.25``, ``normalizer *= 0.6``
  (ref :102-105); LEEDS: ``s *= 1.4375``, normalizer = torso diagonal
  ``dist(pts[2], pts[13])`` (ref :106-109);
- train-time augmentation: scale ``s * 2^g(0.25)``, rotation ``g(30)``
  zeroed with prob 0.6, horizontal flip with prob 0.5 (image mirror + joint
  shuffle + center reflect), per-channel brightness (ref :121-136);
- affine crop to 256, points to 64-space with int truncation, sigma=1
  unnormalized Gaussian heatmaps (ref :139-151).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from cunet_tpu.data.augment import (
    color_jitter,
    crop_host,
    fliplr_image,
    load_image,
    render_heatmaps_host,
    sample_from_bounded_gaussian,
)
from cunet_tpu.geometry import MPII_FLIP_PAIRS, shufflelr, transform_pts_int


class MPIIDataset:
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
            if val["dataset"] == "MPII":
                if val["isValidation"]:
                    self.valid_ids.append(idx)
                else:
                    self.train_ids.append(idx)

    def __len__(self) -> int:
        return len(self.train_ids if self.is_train else self.valid_ids)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        ids = self.train_ids if self.is_train else self.valid_ids
        a = self.anno[ids[index]]

        img = load_image(os.path.join(self.img_folder, a["img_paths"]))
        pts = np.asarray(a["joint_self"], np.float64)[:, :2]
        c = np.asarray(a["objpos"], np.float64).copy()
        s = float(a["scale_provided"])

        if a["dataset"] == "MPII":
            c[1] = c[1] + 15 * s
            s = s * 1.25
            normalizer = a["normalizer"] * 0.6
        elif a["dataset"] == "LEEDS":
            s = s * 1.4375
            normalizer = float(np.linalg.norm(pts[2] - pts[13]))
        else:
            raise ValueError(f"unknown dataset tag: {a['dataset']}")

        r = 0.0
        if self.is_train:
            s = s * (2 ** sample_from_bounded_gaussian(self.scale_factor, self.rng))
            r = sample_from_bounded_gaussian(self.rot_factor, self.rng)
            if self.rng.uniform(0, 1) <= 0.6:
                r = 0.0
            if self.rng.random_sample() <= 0.5:
                img = fliplr_image(img)
                pts = shufflelr(pts, width=img.shape[1], pairs=MPII_FLIP_PAIRS)
                c[0] = img.shape[1] - c[0]
            img = color_jitter(img, self.rng)

        inp = crop_host(img, c, s, r, self.inp_res, self.std_size, native=self.native_crop)
        pts_aug = transform_pts_int(pts, c, s, r, self.out_res, self.std_size)
        heatmap = render_heatmaps_host(pts_aug, self.out_res, self.out_res, self.sigma)
        # valid_pts: zero where skipped (ref:pylib/HumanPts.py:38-46)
        valid = (pts_aug[:, 0] > 0) & (pts_aug[:, 1] > 0)
        pts_aug = np.where(valid[:, None], pts_aug, 0)

        return {
            "image": inp.astype(np.float32),
            "heatmap": heatmap,
            "center": c.astype(np.float32),
            "scale": np.float32(s),
            "rot": np.float32(r),
            "pts": pts.astype(np.float32),
            "normalizer": np.float32(normalizer),
            "index": np.int32(index),
        }
