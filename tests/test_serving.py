"""Serving API tests: compiled predictor, padding/chunking, flip-test,
checkpoint loading."""

import jax
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, TrainConfig
from cunet_tpu.models import init_cu_net
from cunet_tpu.serving import Predictor

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4,
             num_blocks=2)
CFG = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)


class TestPredictor:
    def test_heatmaps_and_padding(self):
        pred = Predictor(CFG, batch_size=4)
        imgs = np.random.RandomState(0).rand(6, 32, 32, 3).astype(np.float32)
        hm = pred.heatmaps(imgs)  # 6 images over batch 4 -> 2 chunks w/ pad
        assert hm.shape == (6, 8, 8, 4)
        # padding must not affect real samples: compare against exact-batch run
        hm_exact = pred.heatmaps(imgs[:4])
        np.testing.assert_allclose(hm[:4], hm_exact, rtol=1e-5, atol=1e-6)

    def test_predict_coords_shape(self):
        pred = Predictor(CFG, batch_size=2)
        imgs = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
        pts = pred.predict(imgs)
        assert pts.shape == (2, 4, 2)
        assert (pts >= 0).all()

    def test_flip_test_changes_output(self):
        imgs = np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32)
        a = Predictor(CFG, batch_size=2, flip_test=False, seed=3).heatmaps(imgs)
        pairs = np.array([[0, 1]])  # 4-class toy flip table
        b = Predictor(CFG, batch_size=2, flip_test=True, flip_pairs=pairs,
                      seed=3).heatmaps(imgs)
        assert not np.allclose(a, b)

    def test_from_checkpoint(self, tmp_path):
        from cunet_tpu.train import create_train_state, make_optimizer
        from cunet_tpu.utils import Checkpoint, TrainHistory

        params, bn = init_cu_net(jax.random.PRNGKey(7), CFG)
        tx = make_optimizer(TrainConfig())
        state = create_train_state(params, bn, tx)
        h = TrainHistory()
        h.update({"epoch": 1}, {"lr": 2.5e-4}, {"train_loss": 1.0}, {"val_pckh": 0.5})
        Checkpoint(str(tmp_path)).save(state, h)

        pred = Predictor.from_checkpoint(CFG, str(tmp_path), "lr-0.00025-1",
                                         batch_size=2)
        imgs = np.random.RandomState(3).rand(2, 32, 32, 3).astype(np.float32)
        got = pred.heatmaps(imgs)
        want = Predictor(CFG, params, bn, batch_size=2).heatmaps(imgs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
