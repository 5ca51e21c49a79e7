"""Natively stacked steady-slot params: round-trip + exact parity.

The stacked runtime form stores slots >= start as one leading-S array per
leaf so lax.scan consumes them without per-step jnp.stack marshaling
(the ~13 ms/step cost measured in PARITY.md's round-2 training table).
Checkpoints keep the canonical per-slot-list form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, TrainConfig
from cunet_tpu.models import (
    apply_cu_net,
    init_cu_net,
    is_stacked,
    stack_steady,
    unstack_steady,
)

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4,
             num_blocks=2)


def _cfg(**kw):
    base = dict(layer_num=4, order=1, loss_num=4, use_scan=True, **SMALL)
    base.update(kw)
    return ModelConfig(**base)


class TestRoundTrip:
    @pytest.mark.parametrize("order", [0, 1, 2])
    def test_stack_unstack_identity(self, order):
        cfg = _cfg(order=order, loss_num=5, layer_num=5)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        for tree in (params, state):
            st = stack_steady(tree, cfg)
            assert is_stacked(st) or tree is state  # state has no "heads"?
            rt = unstack_steady(st, cfg)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)), tree, rt)

    def test_is_stacked(self):
        cfg = _cfg()
        params, _ = init_cu_net(jax.random.PRNGKey(0), cfg)
        assert not is_stacked(params)
        assert is_stacked(stack_steady(params, cfg))


class TestForwardParity:
    @pytest.mark.parametrize("order", [1, 2])
    def test_eval_lax_matches_canonical(self, order):
        cfg = _cfg(order=order, loss_num=5, layer_num=5)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_c, _ = apply_cu_net(params, state, x, cfg=cfg, train=False)
        out_s, _ = apply_cu_net(stack_steady(params, cfg),
                                stack_steady(state, cfg), x,
                                cfg=cfg, train=False)
        for a, b in zip(out_c, out_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_train_states_match(self):
        """BN running-state updates must be identical, including the
        non-anchored-head no-update rule."""
        cfg = _cfg(loss_num=2)  # anchors {2, 4}: slots 1, 3 anchored
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_c, ns_c = apply_cu_net(params, state, x, cfg=cfg, train=True)
        out_s, ns_s = apply_cu_net(stack_steady(params, cfg),
                                   stack_steady(state, cfg), x,
                                   cfg=cfg, train=True)
        for a, b in zip(out_c, out_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
        ns_s_canon = {k: (unstack_steady(ns_s, cfg)[k]
                          if k != "stem" else ns_s[k])
                      for k in ("stem", "hg", "intermedia", "heads")}
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
            {k: ns_c[k] for k in ("stem", "hg", "intermedia", "heads")},
            ns_s_canon)

    def test_grads_match(self):
        cfg = _cfg()
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))

        def loss_c(p):
            outs, _ = apply_cu_net(p, state, x, cfg=cfg, train=True)
            return sum(jnp.mean((o - tgt) ** 2) for o in outs)

        st_state = stack_steady(state, cfg)

        def loss_s(p):
            outs, _ = apply_cu_net(p, st_state, x, cfg=cfg, train=True)
            return sum(jnp.mean((o - tgt) ** 2) for o in outs)

        g_c = jax.grad(loss_c)(params)
        g_s = jax.grad(loss_s)(stack_steady(params, cfg))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
            g_c, unstack_steady(g_s, cfg))

    def test_unrolled_requires_canonical(self):
        cfg = _cfg(use_scan=False)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 32, 32, 3))
        with pytest.raises(ValueError, match="stacked"):
            apply_cu_net(stack_steady(params, cfg), stack_steady(state, cfg),
                         x, cfg=cfg, train=False)


class TestQuantStacked:
    """Quant transforms on natively stacked storage == stack(transform of
    canonical): per-filter reductions vmap over the slot dim and the
    reference's last-intermedia-adapter exclusion maps to the stacked
    leaf's last slice (ref:utils/quantize.py:85-91)."""

    @pytest.mark.parametrize("policy", ["reference", "heads_out"])
    def test_transforms_match_canonical(self, policy):
        from cunet_tpu.config import QuantConfig
        from cunet_tpu.quant import (
            preprocess_masters,
            quantize_params,
            selected_conv_predicate,
        )

        cfg = _cfg(layer_num=5, loss_num=5)
        qcfg = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True)
        params, _ = init_cu_net(jax.random.PRNGKey(0), cfg)
        sp = stack_steady(params, cfg)

        pred_c = selected_conv_predicate(params, policy)
        pred_s = selected_conv_predicate(sp, policy)

        def both(p, pred):
            return quantize_params(preprocess_masters(p, qcfg, pred),
                                   qcfg, pred)

        ref = stack_steady(both(params, pred_c), cfg)
        got = both(sp, pred_s)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
            ref, got)

    def test_quant_train_step_stacked(self):
        """quant_train_step runs on stacked masters (CLI fast path) and the
        loss matches the canonical run exactly."""
        import optax

        from cunet_tpu.config import QuantConfig
        from cunet_tpu.train.quant_step import quant_train_step
        from cunet_tpu.train.state import create_train_state

        cfg = _cfg(layer_num=4, loss_num=4, bn_tile=2,
                   bn_dtype="compute", remat="none")
        qcfg = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = optax.sgd(1e-3)
        batch = {
            "image": jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)),
            "heatmap": jax.random.uniform(jax.random.PRNGKey(2), (4, 8, 8, 4)),
        }
        s_c = create_train_state(params, bn, tx)
        s_s = create_train_state(stack_steady(params, cfg),
                                 stack_steady(bn, cfg), tx)
        _, m_c = quant_train_step(s_c, batch, cfg=cfg, qcfg=qcfg, tx=tx)
        n_s, m_s = quant_train_step(s_s, batch, cfg=cfg, qcfg=qcfg, tx=tx)
        assert is_stacked(n_s.params)
        np.testing.assert_allclose(float(m_s["loss"]), float(m_c["loss"]),
                                   rtol=1e-5)


class TestCheckpointInterop:
    """Checkpoints are canonical on disk regardless of runtime layout:
    stacked runs save/load against canonical runs and vice versa."""

    def _state(self, cfg, stacked):
        from cunet_tpu.train import create_train_state, make_optimizer

        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        if stacked:
            params, bn = stack_steady(params, cfg), stack_steady(bn, cfg)
        tx = make_optimizer(TrainConfig(lr=2.5e-4, batch_size=2))
        return create_train_state(params, bn, tx)

    @pytest.mark.parametrize("save_stacked,load_stacked",
                             [(True, True), (True, False), (False, True)])
    def test_cross_mode_roundtrip(self, tmp_path, save_stacked, load_stacked):
        from cunet_tpu.models.cu_net import canonicalize_slots
        from cunet_tpu.utils.checkpoint import Checkpoint
        from cunet_tpu.utils.history import TrainHistory

        cfg = _cfg()
        ckpt = Checkpoint(str(tmp_path))
        hist = TrainHistory("max", "val_pckh")
        hist.update({"epoch": 1}, {"lr": 2.5e-4}, {"train_loss": 1.0},
                    {"val_pckh": 0.5})
        src = self._state(cfg, save_stacked)
        ckpt.save(src, hist)
        template = self._state(cfg, load_stacked)
        # template params differ from src (same key here, so perturb)
        template = template.replace(
            params=jax.tree_util.tree_map(lambda x: x * 0, template.params))
        restored, _ = ckpt.load(template, ckpt.ckpt_name(2.5e-4, 1))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            canonicalize_slots(restored.params),
            canonicalize_slots(src.params))

    def test_canonicalize_passthrough_on_canonical(self):
        from cunet_tpu.models.cu_net import canonicalize_slots

        cfg = _cfg()
        state = self._state(cfg, stacked=False)
        rt = canonicalize_slots(state)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), state, rt)


class TestTrainStepStacked:
    def test_fused_train_step_descends(self):
        """create_train_state + train_step on the stacked pytree (the fast
        driver-benchable configuration, interpret mode on CPU)."""
        from cunet_tpu.train import (
            create_train_state,
            make_optimizer,
            train_step,
        )

        cfg = _cfg(use_pallas=True, bn_tile=1, bn_dtype="compute")
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(TrainConfig(lr=1e-3, batch_size=2))
        ts = create_train_state(stack_steady(params, cfg),
                                stack_steady(state, cfg), tx)
        batch = {
            "image": jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)),
            "heatmap": jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4)),
        }
        step = jax.jit(lambda s, b: train_step(s, b, cfg=cfg, tx=tx))
        losses = []
        for _ in range(3):
            ts, m = step(ts, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True
        assert losses[-1] < losses[0]
