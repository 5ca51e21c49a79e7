"""Training-stack tests: optimizer parity, schedules, sharded step on a mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cunet_tpu.config import ModelConfig, TrainConfig
from cunet_tpu.models import apply_cu_net, init_cu_net
from cunet_tpu.parallel import batch_sharding, make_mesh, replicated
from cunet_tpu.train import (
    create_train_state,
    eval_step,
    get_lr,
    intermediate_mse,
    lr_at_epoch,
    make_optimizer,
    make_sharded_eval_step,
    make_sharded_train_step,
    set_lr,
    train_step,
)

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4, num_blocks=2)


class TestSchedule:
    def test_mpii(self):
        # ref:utils/util.py:106-119
        assert lr_at_epoch(2.5e-4, 1) == 2.5e-4
        assert lr_at_epoch(2.5e-4, 100) == 2.5e-4
        assert np.isclose(lr_at_epoch(2.5e-4, 101), 5e-5)
        assert np.isclose(lr_at_epoch(2.5e-4, 141), 2.5e-5)
        assert np.isclose(lr_at_epoch(2.5e-4, 161), 1.25e-5)
        assert np.isclose(lr_at_epoch(2.5e-4, 200), 1.25e-5)

    def test_face(self):
        # ref:utils/util.py:121-134
        assert np.isclose(lr_at_epoch(2.5e-4, 30, "face"), 5e-5)
        assert np.isclose(lr_at_epoch(2.5e-4, 95, "face"), 1.25e-5)


class TestRMSpropTorchParity:
    def test_matches_torch_rmsprop(self):
        """optax.rmsprop(eps_in_sqrt=False) must track torch.optim.RMSprop
        (ref:cu-net.py:60-61) step for step."""
        w0 = np.random.RandomState(0).randn(5, 3).astype(np.float32)
        steps = 5
        gs = [np.random.RandomState(i + 1).randn(5, 3).astype(np.float32) for i in range(steps)]

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch.optim.RMSprop([tw], lr=2.5e-4, alpha=0.99, eps=1e-8)
        for g in gs:
            topt.zero_grad()
            tw.grad = torch.from_numpy(g.copy())
            topt.step()

        tx = make_optimizer(TrainConfig())
        params = jnp.asarray(w0)
        opt_state = tx.init(params)
        for g in gs:
            updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
            params = params + updates

        np.testing.assert_allclose(
            np.asarray(params), tw.detach().numpy(), rtol=1e-5, atol=1e-7
        )

    def test_lr_injection(self):
        tx = make_optimizer(TrainConfig(lr=1e-3))
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, bn, tx)
        assert np.isclose(get_lr(state), 1e-3)
        state = set_lr(state, 5e-4)
        assert np.isclose(get_lr(state), 5e-4)


class TestLoss:
    def test_intermediate_mse(self):
        o1 = jnp.ones((2, 4, 4, 3))
        o2 = jnp.zeros((2, 4, 4, 3))
        t = jnp.zeros((2, 4, 4, 3))
        # sum of per-anchor means (ref:cu-net.py:175-178)
        assert float(intermediate_mse([o1, o2], t)) == 1.0


class TestTrainStep:
    def _setup(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        tcfg = TrainConfig(lr=1e-3)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(tcfg)
        state = create_train_state(params, bn, tx)
        batch = {
            "image": jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)),
            "heatmap": jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 4)),
        }
        return cfg, tx, state, batch

    def test_loss_decreases(self):
        cfg, tx, state, batch = self._setup()
        step = jax.jit(lambda s, b: train_step(s, b, cfg=cfg, tx=tx))
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_eval_step(self):
        cfg, tx, state, batch = self._setup()
        m = eval_step(state.params, state.bn_state, batch, cfg=cfg)
        assert m["last_out"].shape == (2, 8, 8, 4)
        assert np.isfinite(float(m["loss"]))


class TestShardedStep:
    def test_8dev_mesh_dp_sp(self):
        """Full sharded train step on the 8-virtual-device CPU mesh:
        dp=4 x sp=2 (batch + spatial partitioning)."""
        assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
        mesh = make_mesh(dp=4, sp=2)
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        tcfg = TrainConfig(lr=1e-3)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(tcfg)
        state = create_train_state(params, bn, tx)
        state = jax.device_put(state, replicated(mesh))
        bsh = batch_sharding(mesh)
        batch = {
            "image": jax.device_put(
                jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)), bsh
            ),
            "heatmap": jax.device_put(
                jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 4)), bsh
            ),
        }
        step = make_sharded_train_step(mesh, cfg, tx, donate=False)
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

        # SPMD must agree with single-device execution (global BN stats).
        ref_state, ref_metrics = train_step(
            jax.device_put(state, jax.devices()[0]),
            {k: np.asarray(v) for k, v in batch.items()},
            cfg=cfg,
            tx=tx,
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )
        a = jax.tree_util.tree_leaves(new_state.params)
        b = jax.tree_util.tree_leaves(ref_state.params)
        # RMSprop divides by sqrt(nu)+eps with tiny nu at step 1, amplifying
        # reduction-order float noise across shards — tolerance reflects that.
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-3, atol=5e-4
            )


class TestShardedQuantStep:
    def test_8dev_mesh_quant_spmd_matches_single_device(self):
        """Quantized train step over dp=4 x sp=2 must equal single-device
        execution — the quant analog of the fp32 SPMD test (the reference's
        BIN/WIG trainers also ran under DataParallel,
        ref:cu-net-prev-version-wig.py:63)."""
        from cunet_tpu.config import QuantConfig
        from cunet_tpu.train.quant_step import (
            make_sharded_quant_train_step,
            quant_train_step,
        )

        assert len(jax.devices()) >= 8
        mesh = make_mesh(dp=4, sp=2)
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        qcfg = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True)
        tcfg = TrainConfig(lr=1e-3)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(tcfg)
        state = create_train_state(params, bn, tx)
        state = jax.device_put(state, replicated(mesh))
        bsh = batch_sharding(mesh)
        batch = {
            "image": jax.device_put(
                jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)), bsh
            ),
            "heatmap": jax.device_put(
                jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 4)), bsh
            ),
        }
        step = make_sharded_quant_train_step(mesh, cfg, qcfg, tx)
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

        ref_state, ref_metrics = quant_train_step(
            jax.device_put(state, jax.devices()[0]),
            {k: np.asarray(v) for k, v in batch.items()},
            cfg=cfg, qcfg=qcfg, tx=tx,
        )
        # quantized forward amplifies cross-shard reduction-order noise
        # (sign() boundaries); measured drift ~5e-5
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
        )
        # Gradients are quantized to 1/2^(bits_g-1) quanta, so float noise at
        # a rounding boundary flips a grad by one quantum, which RMSprop's
        # first step (nu ~ 0.01*g^2) turns into a ~10*lr param jump. SPMD
        # correctness therefore means: most elements bit-identical, the rest
        # within one such jump — a systematic sharding bug would shift all.
        jump = 10 * 1e-3 * 2.5  # 10*lr with margin
        for x, y in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(ref_state.params),
        ):
            d = np.abs(np.asarray(x) - np.asarray(y))
            assert d.max() <= jump, f"param diff beyond one update jump: {d.max()}"
            assert np.median(d) < 1e-4, f"systematic param drift: median {np.median(d)}"


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import importlib.util, pathlib

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)


class TestShardmapPallasStep:
    """Data-parallel training with the fused Pallas train kernels goes
    through shard_map + explicit pmean (GSPMD cannot partition the
    tpu_custom_call); SPMD must equal single-device execution."""

    def test_shardmap_pallas_spmd_matches_single_device(self, monkeypatch):
        import cunet_tpu.kernels.train_slot as ts

        orig = ts.fused_slot_train
        monkeypatch.setattr(
            ts, "fused_slot_train",
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))

        assert len(jax.devices()) >= 4, "conftest must force 8 CPU devices"
        mesh = make_mesh(dp=4, sp=1, devices=jax.devices()[:4])
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, bn_tile=2,
                          use_pallas=True, bn_dtype="compute", remat="none",
                          compute_dtype="float32", **SMALL)
        tcfg = TrainConfig(lr=1e-3)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(tcfg)
        state = create_train_state(params, bn, tx)
        state = jax.device_put(state, replicated(mesh))
        batch_np = {
            "image": np.asarray(
                jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))),
            "heatmap": np.asarray(
                jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 4))),
        }
        batch = {k: jax.device_put(v, batch_sharding(mesh))
                 for k, v in batch_np.items()}

        # dispatches to make_shardmap_train_step (use_pallas + bn_tile)
        step = make_sharded_train_step(mesh, cfg, tx, donate=False)
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert metrics["last_out"].shape == (8, 8, 8, 4)

        # single-device reference: same ghost-BN tiling (contiguous shards
        # of 2 == bn_tile groups), so numbers must match
        ref_state, ref_metrics = train_step(
            jax.device_put(state, jax.devices()[0]), batch_np,
            cfg=cfg, tx=tx)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5)
        # RMSprop divides by sqrt(nu)+eps with tiny nu at step 1, amplifying
        # psum-vs-serial reduction-order noise — tolerance reflects that
        for x, y in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(ref_state.params)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=5e-3, atol=1e-3)
        for x, y in zip(jax.tree_util.tree_leaves(new_state.bn_state),
                        jax.tree_util.tree_leaves(ref_state.bn_state)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


class TestShardmapPallasEval:
    """Multi-chip SERVING for the Pallas inference kernels: GSPMD cannot
    partition the tpu_custom_call, so make_sharded_eval_step dispatches to
    an explicit shard_map (pmean loss, batch-sharded heatmaps). SPMD must
    equal single-device eval exactly (eval BN uses running stats — no
    per-shard statistics involved)."""

    def test_shardmap_pallas_eval_matches_single_device(self):
        from cunet_tpu.parallel import batch_sharding, make_mesh, replicated

        assert len(jax.devices()) >= 4, "conftest must force 8 CPU devices"
        mesh = make_mesh(dp=4, sp=1, devices=jax.devices()[:4])
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2,
                          use_pallas=True, remat="none",
                          compute_dtype="float32", **SMALL)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        batch_np = {
            "image": np.asarray(
                jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))),
            "heatmap": np.asarray(
                jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 4))),
        }
        p_r = jax.device_put(params, replicated(mesh))
        b_r = jax.device_put(bn, replicated(mesh))
        batch = {k: jax.device_put(v, batch_sharding(mesh))
                 for k, v in batch_np.items()}

        estep = make_sharded_eval_step(mesh, cfg)  # dispatches to shard_map
        out = estep(p_r, b_r, batch)
        ref = eval_step(params, bn, batch_np, cfg=cfg)
        np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["last_out"]),
                                   np.asarray(ref["last_out"]),
                                   rtol=1e-5, atol=1e-5)

    def test_spatial_mesh_raises_for_pallas_eval(self):
        from cunet_tpu.parallel import make_mesh
        from cunet_tpu.train.step import make_shardmap_eval_step

        mesh = make_mesh(dp=4, sp=2)
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2,
                          use_pallas=True, remat="none", **SMALL)
        with pytest.raises(ValueError, match="sp=1"):
            make_shardmap_eval_step(mesh, cfg)
