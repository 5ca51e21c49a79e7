"""Synthetic landmark data: random joints -> consistent images + heatmaps.

No reference counterpart (the reference's dataset JSONs are absent from its
snapshot); used for tests, benchmarks, and smoke training. Images contain
bright blobs at the joint locations so a model can actually learn the
mapping, and samples carry the full MPII-style metadata tuple
(center/scale/rot/pts/normalizer) so the whole train/eval path exercises.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cunet_tpu.ops.heatmap import render_heatmaps_np


class SyntheticLandmarkDataset:
    def __init__(
        self,
        length: int = 64,
        inp_res: int = 256,
        out_res: int = 64,
        num_joints: int = 16,
        seed: int = 0,
        is_train: bool = True,
    ):
        self.length = length
        self.inp_res = inp_res
        self.out_res = out_res
        self.num_joints = num_joints
        self.seed = seed
        self.is_train = is_train

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + index)
        pts_out = rng.uniform(6, self.out_res - 6, size=(self.num_joints, 2))
        ratio = self.inp_res / self.out_res
        pts_in = pts_out * ratio

        img = rng.uniform(0, 0.1, size=(self.inp_res, self.inp_res, 3)).astype(
            np.float32
        )
        ys, xs = np.mgrid[0 : self.inp_res, 0 : self.inp_res]
        for j in range(self.num_joints):
            d2 = (xs - pts_in[j, 0]) ** 2 + (ys - pts_in[j, 1]) ** 2
            img[:, :, j % 3] += np.exp(-d2 / (2 * 9.0**2)).astype(np.float32)
        img = np.clip(img, 0, 1)

        heatmap = render_heatmaps_np(
            pts_out.astype(int), self.out_res, self.out_res
        )
        return {
            "image": img,
            "heatmap": heatmap,
            "center": np.array([self.inp_res / 2, self.inp_res / 2], np.float32),
            "scale": np.float32(self.inp_res / 200.0),
            "rot": np.float32(0.0),
            "pts": pts_in.astype(np.float32),
            "normalizer": np.float32(self.out_res / 10.0),
            "index": np.int32(index),
        }
