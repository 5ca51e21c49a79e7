"""End-to-end learning test: the model must actually learn the synthetic
landmark task (the reference's quality control was validation-as-test,
SURVEY.md §4 — this is the automated version)."""

import jax
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, TrainConfig
from cunet_tpu.data import DataLoader, SyntheticLandmarkDataset
from cunet_tpu.evaluation import accuracy
from cunet_tpu.models import init_cu_net
from cunet_tpu.train import create_train_state, make_optimizer, train_step


class TestLearns:
    def test_pck_improves_on_synthetic(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, neck_size=2,
                          growth_rate=8, init_chan_num=16, class_num=3,
                          num_blocks=2)
        ds = SyntheticLandmarkDataset(length=16, inp_res=32, out_res=8,
                                      num_joints=3, seed=5)
        loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(TrainConfig(lr=2e-3))
        state = create_train_state(params, bn, tx)
        step = jax.jit(lambda s, b: train_step(s, b, cfg=cfg, tx=tx))

        def epoch_pck(state):
            accs, losses = [], []
            for batch in loader:
                state, m = step(
                    state, {"image": batch["image"], "heatmap": batch["heatmap"]}
                )
                losses.append(float(m["loss"]))
                acc = accuracy(np.asarray(m["last_out"], np.float32),
                               batch["heatmap"], idxs=[0, 1, 2], thr=1.0)
                accs.append(float(acc[0]))
            return state, float(np.mean(losses)), float(np.mean(accs))

        state, loss0, pck0 = epoch_pck(state)
        for _ in range(14):
            state, loss, pck = epoch_pck(state)
        assert loss < loss0 * 0.5, f"loss did not halve: {loss0} -> {loss}"
        assert pck > pck0 + 0.2 or pck > 0.8, (
            f"PCK did not improve: {pck0} -> {pck}"
        )
