"""Fuzz the decode path against a literal torch re-expression of the
reference's documented semantics (ref:pylib/Evaluation.py:6-23,108-132).

The torch oracle here is written from the SURVEY description — 1-indexed
flat argmax, zero-mask on non-positive maxima, the px>1/px<W refinement
window, sign-of-neighbor-gradient quarter shifts, +0.5 — and serves as an
implementation-independent check of cunet_tpu.evaluation.decode.
"""

import math

import numpy as np
import pytest
import torch

from cunet_tpu.evaluation import get_preds, quarter_pixel_refine


def torch_get_preds(scores_nchw: torch.Tensor) -> torch.Tensor:
    n, c, hh, ww = scores_nchw.shape
    maxval, idx = torch.max(scores_nchw.view(n, c, -1), 2)
    idx = idx.view(n, c, 1) + 1
    preds = idx.repeat(1, 1, 2).float()
    preds[:, :, 0] = (preds[:, :, 0] - 1) % ww + 1
    preds[:, :, 1] = torch.floor((preds[:, :, 1] - 1) / hh) + 1
    mask = maxval.gt(0).view(n, c, 1).repeat(1, 1, 2).float()
    return preds * mask


def torch_refine(scores_nchw: torch.Tensor, coords: torch.Tensor) -> torch.Tensor:
    n, c, hh, ww = scores_nchw.shape
    out = coords.clone()
    for i in range(n):
        for p in range(c):
            hm = scores_nchw[i][p]
            px = int(math.floor(coords[i][p][0]))
            py = int(math.floor(coords[i][p][1]))
            if 1 < px < ww and 1 < py < hh:
                diff = torch.tensor(
                    [hm[py - 1][px] - hm[py - 1][px - 2],
                     hm[py][px - 1] - hm[py - 2][px - 1]]
                )
                out[i][p] += diff.sign() * 0.25
    return out + 0.5


class TestDecodeFuzz:
    @pytest.mark.parametrize("seed", range(5))
    def test_get_preds_and_refine_match_torch(self, seed):
        rs = np.random.RandomState(seed)
        hm = rs.randn(3, 8, 8, 6).astype(np.float32)
        # force some all-negative channels (zero-mask path)
        hm[:, :, :, 0] = -np.abs(hm[:, :, :, 0])
        t = torch.from_numpy(hm.transpose(0, 3, 1, 2))

        got = get_preds(hm)
        want = torch_get_preds(t).numpy()
        np.testing.assert_array_equal(got, want)

        got_r = quarter_pixel_refine(hm, got)
        want_r = torch_refine(t, torch.from_numpy(want)).numpy()
        np.testing.assert_allclose(got_r, want_r, atol=1e-6)
