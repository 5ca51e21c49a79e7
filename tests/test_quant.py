"""Quantization tests: primitives vs torch-semantics goldens, STE masks,
XNOR gradient, selection policy, end-to-end quantized step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, QuantConfig, TrainConfig
from cunet_tpu.models import init_cu_net
from cunet_tpu.quant import (
    binarize_weight_value,
    clip_c,
    fake_quant_weight,
    quan_input,
    quant_q,
    scale_s,
    selected_conv_predicate,
    ternarize_weight_value,
)
from cunet_tpu.quant.transforms import _path_str
from cunet_tpu.train import create_train_state, make_optimizer
from cunet_tpu.train.quant_step import quant_eval_params, quant_train_step

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4, num_blocks=2)


class TestPrimitives:
    def test_scale(self):
        # ref:utils/quantize.py:15-16
        assert scale_s(8) == 128.0
        assert scale_s(1) == 1.0

    def test_clip(self):
        # ref:utils/quantize.py:20-28: delta = 1/S unless bits>15 or in {1,2}
        x = jnp.array([-2.0, -0.5, 0.5, 2.0])
        np.testing.assert_allclose(clip_c(x, 8), [-1 + 1 / 128, -0.5, 0.5, 1 - 1 / 128])
        np.testing.assert_allclose(clip_c(x, 1), [-1, -0.5, 0.5, 1])
        np.testing.assert_allclose(clip_c(x, 2), [-1, -0.5, 0.5, 1])
        np.testing.assert_allclose(clip_c(x, 32), [-1, -0.5, 0.5, 1])

    def test_quant(self):
        # ref:utils/quantize.py:33-42
        x = jnp.array([-0.7, -0.2, 0.3, 0.8])
        np.testing.assert_allclose(quant_q(x, 32), x)                 # identity
        np.testing.assert_allclose(quant_q(x, 1), [-1, -1, 1, 1])     # sign
        np.testing.assert_allclose(quant_q(x, 2), [-1, -0, 0, 1])     # round
        got = quant_q(x, 8)
        np.testing.assert_allclose(got, np.round(np.asarray(x) * 128) / 128, atol=1e-7)

    def test_round_half_away_matches_torch(self):
        import torch

        x = np.array([-1.5, -0.5, 0.5, 1.5, 2.5], np.float32)
        # torch.round in the reference's 0.x era rounds half away from zero
        np.testing.assert_allclose(
            np.asarray(quant_q(jnp.asarray(x), 2)), [-2, -1, 1, 2, 3]
        )


class TestQuanInputSTE:
    def test_forward(self):
        x = jnp.array([-1.5, -0.3, 0.3, 0.996, 1.5])
        y = quan_input(x, 8)
        expect = np.round(np.clip(np.asarray(x), -1 + 1 / 128, 1 - 1 / 128) * 128) / 128
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-7)

    def test_backward_mask(self):
        # grad passes through except where |x| >= 1 (ref:utils/quantize.py:58-63)
        x = jnp.array([-1.5, -1.0, -0.3, 0.3, 1.0, 1.5])
        g = jax.grad(lambda x: jnp.sum(quan_input(x, 8) * jnp.arange(1.0, 7.0)))(x)
        np.testing.assert_allclose(np.asarray(g), [0, 0, 3, 4, 0, 0])

    def test_bits_over_15_identity(self):
        x = jnp.array([-0.37, 0.61])
        np.testing.assert_allclose(np.asarray(quan_input(x, 16)), np.asarray(x))


class TestWeightQuant:
    def test_binarize_scale_per_filter(self):
        # HWIO weight, 2 output filters (ref:utils/quantize.py:127-134)
        w = jnp.stack(
            [jnp.full((3, 3, 2), 0.3), jnp.full((3, 3, 2), -0.5)], axis=-1
        )
        q = binarize_weight_value(w, bits_g=20)  # >15: scale not rounded
        np.testing.assert_allclose(np.asarray(q[..., 0]), 0.3, atol=1e-7)
        np.testing.assert_allclose(np.asarray(q[..., 1]), -0.5, atol=1e-7)

    def test_bits_w1_matches_reference_dangling_else(self):
        """ref:utils/quantize.py:126-149: the ``else`` dangles on
        ``if bitsW == 2``, so bitsW==1 ALSO runs Q(C(w,1),1) after the scaled
        binarization — effective forward = unscaled sign(w), zeroed where the
        bits_g-quantized scale rounds to 0. fake_quant_weight must reproduce
        that effective behavior (numpy oracle simulates the ref control flow)."""
        rs = np.random.RandomState(3)
        # filter 0: normal magnitudes; filter 1: tiny (scale rounds to 0 at bits_g=8)
        w = np.concatenate(
            [rs.randn(3, 3, 4, 1).astype(np.float32) * 0.5,
             rs.randn(3, 3, 4, 1).astype(np.float32) * 1e-3],
            axis=-1,
        )

        def ref_quantize(wn, bits_w, bits_g):  # ref control flow, verbatim
            out = wn.copy()
            if bits_w == 1:
                m = np.mean(np.abs(wn), axis=(0, 1, 2), keepdims=True)
                m = np.round(m * 2.0 ** (bits_g - 1)) / 2.0 ** (bits_g - 1)
                out = np.sign(wn) * m
            if bits_w == 2:
                pass  # ternary (not under test here)
            else:
                out = np.sign(np.clip(out, -1, 1))  # Q(C(out,1),1)
            return out

        got = np.asarray(fake_quant_weight(jnp.asarray(w), 1, 8))
        np.testing.assert_allclose(got, ref_quantize(w, 1, 8), atol=0)
        assert np.all(got[..., 1] == 0)  # tiny filter collapses to zero
        assert set(np.unique(got[..., 0])) <= {-1.0, 1.0}

    def test_binarize_scaled_variant_keeps_scale(self):
        from cunet_tpu.quant import binarize_weight_value_ref

        w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 2, 2).astype(np.float32))
        scaled = np.asarray(binarize_weight_value(w, 8))
        ref_eff = np.asarray(binarize_weight_value_ref(w, 8))
        assert np.abs(scaled).max() < 1.0  # carries the mean|w| scale
        assert set(np.unique(ref_eff)) <= {-1.0, 0.0, 1.0}
        np.testing.assert_allclose(np.sign(scaled), ref_eff)

    def test_ternarize_threshold(self):
        # threshold 0.7*mean|w|; outputs in {-1,0,1} unscaled (ref :135-147)
        w = jnp.array([1.0, -1.0, 0.1, -0.1]).reshape(1, 1, 4, 1)
        q = ternarize_weight_value(w)  # mean|w| = 0.55, thr = 0.385
        np.testing.assert_allclose(np.asarray(q).flatten(), [1, -1, 0, 0])

    def test_xnor_gradient(self):
        """Backward of fake_quant_weight at bits_w=1 must equal the
        hand-derived XNOR formula (ref:utils/quantize.py:156-173)."""
        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(3, 3, 4, 2).astype(np.float32) * 0.7)
        g = jnp.asarray(rs.randn(3, 3, 4, 2).astype(np.float32))
        bits_g = 8

        got = jax.vjp(lambda w: fake_quant_weight(w, 1, bits_g), w)[1](g)[0]

        # independent numpy oracle
        wn, gn = np.asarray(w), np.asarray(g)
        n = 3 * 3 * 4
        c_in = 4
        m = np.mean(np.abs(wn), axis=(0, 1, 2), keepdims=True) * np.ones_like(wn)
        m[(wn < -1) | (wn > 1)] = 0
        m = np.round(m * 128) / 128
        m = m * gn
        m_add = np.mean(gn * np.sign(wn), axis=(0, 1, 2), keepdims=True) * np.sign(wn)
        out = (m + m_add) * (1 - 1 / c_in) * n
        out = np.clip(out, -1 + 1 / 128, 1 - 1 / 128)
        out = np.round(out * 128) / 128
        np.testing.assert_allclose(np.asarray(got), out, atol=1e-6)

    def test_ste_gradient_quantized(self):
        w = jnp.asarray(np.random.RandomState(0).randn(1, 1, 4, 2).astype(np.float32))
        g = jnp.full((1, 1, 4, 2), 0.333)
        got = jax.vjp(lambda w: fake_quant_weight(w, 4, 8), w)[1](g)[0]
        np.testing.assert_allclose(np.asarray(got), np.round(0.333 * 128) / 128)


class TestSelectionPolicy:
    def test_reference_policy_exclusions(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        params, _ = init_cu_net(jax.random.PRNGKey(0), cfg)
        pred = selected_conv_predicate(params, "reference")
        paths = []
        def visit(path, leaf):
            if hasattr(leaf, "ndim") and leaf.ndim == 4:
                paths.append((_path_str(path), pred(path)))
            return leaf
        jax.tree_util.tree_map_with_path(visit, params)
        d = dict(paths)
        assert d["stem/conv"] is False              # first conv excluded
        assert d["intermedia/adapters/0/conv"] is False  # last traversal conv
        assert d["heads/0/conv"] is True            # heads ARE quantized (ref quirk)
        assert d["hg/down/0/layers/0/conv2"] is True

    def test_heads_out_policy(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        params, _ = init_cu_net(jax.random.PRNGKey(0), cfg)
        pred = selected_conv_predicate(params, "heads_out")
        assert not pred(_fake_path(["heads", 0, "conv"]))


def _fake_path(keys):
    import jax.tree_util as jtu

    out = []
    for k in keys:
        if isinstance(k, int):
            out.append(jtu.SequenceKey(k))
        else:
            out.append(jtu.DictKey(k))
    return tuple(out)


class TestQuantTrainStep:
    def test_step_runs_and_descends(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        qcfg = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True)
        tcfg = TrainConfig(lr=1e-3)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(tcfg)
        state = create_train_state(params, bn, tx)
        batch = {
            "image": jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)),
            "heatmap": jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 4)),
        }
        step = jax.jit(
            lambda s, b: quant_train_step(s, b, cfg=cfg, qcfg=qcfg, tx=tx)
        )
        losses = []
        for _ in range(3):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(l) for l in losses)
        # quantized eval weights are the reference-effective unscaled signs
        qp = quant_eval_params(state.params, qcfg)
        w = np.asarray(qp["hg"]["down"][0]["layers"][0]["conv2"])
        assert set(np.unique(w)) <= {-1.0, 0.0, 1.0}


class TestQuantPallasGuard:
    def test_quant_eval_ignores_fused_block_kernels(self, monkeypatch):
        """Quantized eval must bypass the block/slot fused kernels (they skip
        the activation quantizers) and still match the lax path exactly."""
        import cunet_tpu.kernels.fused_bottleneck as fb

        for name in ["fused_bottleneck_infer", "fused_dual_bottleneck_infer"]:
            orig = getattr(fb, name)
            monkeypatch.setattr(fb, name,
                                lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
        from cunet_tpu.models import apply_cu_net, init_cu_net
        from cunet_tpu.train.quant_step import quant_eval_params

        cfg_p = ModelConfig(layer_num=4, order=1, loss_num=2, use_pallas=True,
                            pallas_hourglass=True, pallas_whole_model=True, **SMALL)
        cfg_l = ModelConfig(layer_num=4, order=1, loss_num=2, use_pallas=False, **SMALL)
        qcfg = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        qp = quant_eval_params(params, qcfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        out_p, _ = apply_cu_net(qp, state, x, cfg=cfg_p, train=False, quant=qcfg)
        out_l, _ = apply_cu_net(qp, state, x, cfg=cfg_l, train=False, quant=qcfg)
        for a, b in zip(out_p, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
