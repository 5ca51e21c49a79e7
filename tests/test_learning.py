"""End-to-end learning test: the model must actually learn the synthetic
landmark task (the reference's quality control was validation-as-test,
SURVEY.md §4 — this is the automated version)."""

import jax
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, QuantConfig, TrainConfig
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

    def test_quantized_training_converges(self):
        """W1/I8/G8 quantized training must CONVERGE, not just run one step —
        SURVEY §7.3 hard part #5 (WAGE quantization x RMSprop-eps stability).
        Guards the whole STE/XNOR plumbing: a broken gradient correction
        stalls the loss even when a single step's algebra looks right."""
        from cunet_tpu.train.quant_step import quant_train_step

        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, neck_size=2,
                          growth_rate=8, init_chan_num=16, class_num=3,
                          num_blocks=2)
        qcfg = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True)
        ds = SyntheticLandmarkDataset(length=16, inp_res=32, out_res=8,
                                      num_joints=3, seed=5)
        loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(TrainConfig(lr=2e-3))
        state = create_train_state(params, bn, tx)
        step = jax.jit(lambda s, b: quant_train_step(s, b, cfg=cfg, qcfg=qcfg, tx=tx))

        def epoch_loss(state):
            losses = []
            for batch in loader:
                state, m = step(
                    state, {"image": batch["image"], "heatmap": batch["heatmap"]}
                )
                losses.append(float(m["loss"]))
            return state, float(np.mean(losses))

        state, loss0 = epoch_loss(state)
        for _ in range(15):
            state, loss = epoch_loss(state)
        # measured: 2.59 -> 0.21 over 16 epochs; 0.25x is a comfortable bar
        assert np.isfinite(loss)
        assert loss < loss0 * 0.25, f"quantized loss stalled: {loss0} -> {loss}"
