"""Experiment-services tests: history, meters, TSV logger, checkpoint."""

import os

import jax
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, TrainConfig
from cunet_tpu.models import init_cu_net
from cunet_tpu.train import create_train_state, make_optimizer
from cunet_tpu.utils import (
    AverageMeter,
    Checkpoint,
    TrainHistory,
    TsvLogger,
    draw_landmarks,
    save_image_grid,
    strip_resume_prefix,
)

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4, num_blocks=2)


class TestHistory:
    def test_best_tracking_max(self):
        h = TrainHistory("max", "val_pckh")
        h.update({"epoch": 1}, {"lr": 1e-3}, {"train_loss": 0.5}, {"val_pckh": 0.7})
        assert h.is_best and h.best_metric == 0.7
        h.update({"epoch": 2}, {"lr": 1e-3}, {"train_loss": 0.4}, {"val_pckh": 0.6})
        assert not h.is_best and h.best_metric == 0.7

    def test_best_tracking_min_face(self):
        # TrainHistoryFace semantics: val_rmse min, best init 1.0
        h = TrainHistory("min", "val_rmse")
        h.update({"epoch": 1}, {"lr": 1e-3}, {"train_loss": 0.5}, {"val_rmse": 0.08})
        assert h.is_best
        h.update({"epoch": 2}, {"lr": 1e-3}, {"train_loss": 0.4}, {"val_rmse": 0.09})
        assert not h.is_best

    def test_roundtrip(self):
        h = TrainHistory()
        h.update({"epoch": 1}, {"lr": 1e-3}, {"train_loss": 0.5}, {"val_pckh": 0.7})
        h2 = TrainHistory()
        h2.load_state_dict(h.state_dict())
        assert h2.best_metric == 0.7 and h2.last_epoch == 1


class TestMeter:
    def test_weighted_average(self):
        m = AverageMeter()
        m.update(2.0, n=3)
        m.update(4.0, n=1)
        assert m.avg == (2 * 3 + 4) / 4
        assert m.val == 4.0


class TestTsvLogger:
    def test_write_resume(self, tmp_path):
        p = str(tmp_path / "summary.txt")
        lg = TsvLogger(p)
        lg.set_names(["epoch", "lr", "loss"])
        lg.append([1, 2.5e-4, 0.5])
        lg.close()
        lg2 = TsvLogger(p, resume=True)
        assert lg2.names == ["epoch", "lr", "loss"]
        assert lg2.numbers["loss"] == [0.5]
        lg2.append([2, 2.5e-4, 0.4])
        lg2.close()
        lines = open(p).read().strip().split("\n")
        assert len(lines) == 3  # header + 2 rows


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(TrainConfig())
        state = create_train_state(params, bn, tx)

        h = TrainHistory()
        h.update({"epoch": 3}, {"lr": 2.5e-4}, {"train_loss": 0.1}, {"val_pckh": 0.8})

        ck = Checkpoint(str(tmp_path))
        preds = np.zeros((5, 16, 2))
        path = ck.save(state, h, preds=preds)
        assert os.path.isdir(path)
        assert os.path.exists(path + "-preds.mat")
        assert os.path.isdir(path + "-model-best")  # is_best epoch

        # perturb then restore
        state2 = state.replace(
            params=jax.tree_util.tree_map(lambda x: x * 0, state.params)
        )
        h2 = TrainHistory()
        name = ck.latest_name()
        restored, h2 = ck.load(state2, name, h2)
        a = jax.tree_util.tree_leaves(restored.params)
        b = jax.tree_util.tree_leaves(state.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
        assert h2.best_metric == 0.8
        assert h2.last_epoch == 3

    def test_lr_encoded_name(self, tmp_path):
        ck = Checkpoint(str(tmp_path))
        # ref naming: lr-%.15f stripped
        assert ck.ckpt_name(2.5e-4, 7) == "lr-0.00025-7"

    def test_strip_resume_prefix(self):
        # ref:options/base_options.py:62-65
        assert strip_resume_prefix("lr-0.00025-7.pth.tar") == "lr-0.00025-7-"


class TestVisualizer:
    def test_draw_and_grid(self, tmp_path):
        img = np.zeros((32, 32, 3), np.float32)
        out = draw_landmarks(img, np.array([[16, 16], [5, 5]]))
        assert out[16, 16].sum() > 0  # white dot drawn
        save_image_grid([out, out, out], str(tmp_path / "g.png"), cols=2)
        assert (tmp_path / "g.png").exists()


class TestGuards:
    def test_check_finite(self):
        from cunet_tpu.utils import check_finite, find_nonfinite, assert_finite
        import jax.numpy as jnp

        good = {"a": jnp.ones((3,)), "b": [jnp.zeros((2,))]}
        bad = {"a": jnp.array([1.0, np.nan]), "b": [jnp.zeros((2,))]}
        assert bool(check_finite(good))
        assert not bool(check_finite(bad))
        names = find_nonfinite(bad)
        assert len(names) == 1 and "a" in names[0]
        with pytest.raises(FloatingPointError):
            assert_finite(bad, "grads")

    def test_guard_update_skips_nan_step(self):
        from cunet_tpu.utils import guard_update
        import flax.struct
        import jax.numpy as jnp

        @flax.struct.dataclass
        class S:
            params: dict

        old = S(params={"w": jnp.ones((2,))})
        new_bad = S(params={"w": jnp.array([np.nan, 1.0])})
        merged, ok = guard_update(new_bad, old, {"loss": jnp.asarray(0.5)})
        assert not bool(ok)
        np.testing.assert_array_equal(np.asarray(merged.params["w"]), [1, 1])


class TestProfiling:
    def test_step_timer(self):
        from cunet_tpu.utils import StepTimer

        t = StepTimer()
        t.data_ready()
        t.step_done()
        assert "data" in t.summary() and "step" in t.summary()

    def test_compiled_cost(self):
        from cunet_tpu.utils import compiled_cost
        import jax.numpy as jnp

        cost = compiled_cost(lambda x: x @ x, jnp.ones((64, 64)))
        assert cost["flops"] > 0


class TestParamCounts:
    def test_coupling_parameter_saving(self):
        """The order-K coupled model must be dramatically smaller than K
        independently stacked dense U-Nets (ref README's ~70% claim)."""
        from cunet_tpu.models import DenseUNetConfig, init_dense_unet
        from cunet_tpu.utils import count_conv_params, count_params

        small = dict(neck_size=2, growth_rate=8, init_chan_num=16, num_blocks=2)
        K = 4
        cu_cfg = ModelConfig(layer_num=K, order=1, loss_num=K, class_num=4, **small)
        cu_p, _ = init_cu_net(jax.random.PRNGKey(0), cu_cfg)
        du_cfg = DenseUNetConfig(layer_num=1, class_num=4, **small)
        du_p, _ = init_dense_unet(jax.random.PRNGKey(0), du_cfg)

        cu_total = count_params(cu_p)
        stacked_total = K * count_params(du_p)
        assert count_conv_params(cu_p) < cu_total
        # CU-Net-K shares the stem and couples instead of duplicating whole
        # nets; it must undercut K independent hourglasses substantially
        assert cu_total < stacked_total
