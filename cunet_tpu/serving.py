"""Inference serving: load weights -> compiled predictor -> landmarks.

The reference has no serving story (validation loops double as inference).
This module packages the full deployment path: restore parameters (Orbax
checkpoint or a converted reference ``.pth.tar``), compile the forward once
at a fixed batch size with the fused Pallas kernels, and serve
``images -> landmark coordinates`` with flip-test ensembling and the
reference-exact quarter-pixel decode. Ragged request sizes are padded to the
compiled batch so the compiled program never changes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cunet_tpu.config import ModelConfig
from cunet_tpu.evaluation import final_preds
from cunet_tpu.geometry import MPII_FLIP_PAIRS, flip_test_merge
from cunet_tpu.models import apply_cu_net, init_cu_net


class Predictor:
    """Compiled landmark predictor.

    Args:
      cfg: model architecture (use bf16 + use_pallas on TPU).
      params/bn_state: parameter pytrees; default = random init (for tests).
      batch_size: compiled batch; requests are padded/chunked to it.
      flip_test: mirror-ensemble (MPII protocol, ref:cu-net.py:240-249).
      flip_pairs: L/R channel table when flip_test.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params=None,
        bn_state=None,
        *,
        batch_size: int = 16,
        flip_test: bool = False,
        flip_pairs=MPII_FLIP_PAIRS,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.batch_size = batch_size
        self.flip_test = flip_test
        self.flip_pairs = flip_pairs
        if params is None or bn_state is None:
            params, bn_state = init_cu_net(jax.random.PRNGKey(seed), cfg)
        self.params = params
        self.bn_state = bn_state

        def fwd(params, bn_state, x):
            outs, _ = apply_cu_net(params, bn_state, x, cfg=cfg, train=False)
            return outs[-1]

        self._fwd = jax.jit(fwd)

    # -- loading -----------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, cfg: ModelConfig, exp_dir: str, name: str, **kw):
        """Restore from an Orbax checkpoint saved by the trainer."""
        from cunet_tpu.config import TrainConfig
        from cunet_tpu.train import create_train_state, make_optimizer
        from cunet_tpu.utils import Checkpoint

        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(TrainConfig())
        state = create_train_state(params, bn, tx)
        state, _ = Checkpoint(exp_dir).load(state, name, None)
        return cls(cfg, state.params, state.bn_state, **kw)

    @classmethod
    def from_torch(cls, cfg: ModelConfig, pth_path: str, **kw):
        """Restore from a reference PyTorch ``.pth.tar`` checkpoint."""
        from cunet_tpu.tools.convert_torch import load_torch_checkpoint, merge_into

        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        cparams, cstate, missing, _ = load_torch_checkpoint(pth_path, cfg)
        for m in missing:
            print(f"=> not converted: {m}")
        return cls(cfg, merge_into(params, cparams), merge_into(bn, cstate), **kw)

    # -- inference ---------------------------------------------------------
    def heatmaps(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) float [0,1] -> (N, h, w, class_num) heatmaps.

        Chunks/pads to the compiled batch size; applies flip-test merging."""
        n = images.shape[0]
        dtype = jnp.dtype(self.cfg.compute_dtype)
        outs = []
        for lo in range(0, n, self.batch_size):
            chunk = images[lo : lo + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            x = jnp.asarray(chunk, dtype)
            out = np.asarray(self._fwd(self.params, self.bn_state, x), np.float32)
            if self.flip_test:
                x2 = jnp.asarray(np.ascontiguousarray(chunk[:, :, ::-1, :]), dtype)
                out2 = np.asarray(
                    self._fwd(self.params, self.bn_state, x2), np.float32
                )
                out = flip_test_merge(out, out2, self.flip_pairs)
            outs.append(out[: chunk.shape[0] - pad if pad else self.batch_size])
        return np.concatenate(outs, axis=0)

    def predict(
        self,
        images: np.ndarray,
        centers: Optional[np.ndarray] = None,
        scales: Optional[np.ndarray] = None,
        rots: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Images -> (N, L, 2) landmark coordinates.

        With crop metadata, coordinates are mapped back to original-image
        space via the quarter-pixel-refined inverse affine
        (ref:pylib/Evaluation.py:108-132); otherwise they are 1-indexed
        heatmap-space coordinates."""
        hm = self.heatmaps(images)
        n, h, w = hm.shape[0], hm.shape[1], hm.shape[2]
        if centers is None:
            centers = np.tile([w / 2, h / 2], (n, 1))
            scales = np.full(n, w / 200.0)
            rots = np.zeros(n)
        if rots is None:
            rots = np.zeros(n)
        return final_preds(hm, centers, scales, [w, h], rots)
