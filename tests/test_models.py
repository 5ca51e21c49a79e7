"""Model structure tests: channel arithmetic, shapes, coupling FIFO, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, loss_anchors
from cunet_tpu.models import (
    DenseUNetConfig,
    apply_cu_net,
    apply_dense_unet,
    dense_block_channels,
    init_cu_net,
    init_dense_unet,
)

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4, num_blocks=2)


class TestLossAnchors:
    def test_reference_formula(self):
        # ref:models/cu_net.py:274-283
        assert loss_anchors(8, 8) == (1, 2, 3, 4, 5, 6, 7, 8)
        assert loss_anchors(8, 1) == (8,)
        assert loss_anchors(8, 2) == (4, 8)
        assert loss_anchors(16, 4) == (4, 8, 12, 16)
        assert loss_anchors(2, 2) == (1, 2)
        # py2 round-half-away-from-zero: K=3, loss=2 -> round(1.5)=2, round(3.0)=3
        assert loss_anchors(3, 2) == (2, 3)

    def test_invalid(self):
        with pytest.raises(ValueError):
            loss_anchors(4, 5)
        with pytest.raises(ValueError):
            loss_anchors(4, 0)

    def test_order_ge_layer_num_rejected(self):
        # ref:models/cu_net.py:285-287
        with pytest.raises(ValueError):
            ModelConfig(layer_num=2, order=2, loss_num=1)


class TestChannelArithmetic:
    def test_dense_block_channels(self):
        # ref:models/cu_net.py:79-101 with defaults (in=128, growth=32)
        cfg = ModelConfig(layer_num=4, order=2, loss_num=4)
        chans = dense_block_channels(cfg, 128)
        assert chans == [(128, 160), (160, 192), (192, 224), (192, 224)]

    def test_order_one(self):
        cfg = ModelConfig(layer_num=3, order=1, loss_num=3)
        chans = dense_block_channels(cfg, 128)
        assert chans == [(128, 160), (160, 192), (160, 192)]

    def test_param_shapes(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        c = cfg.init_chan_num
        # stem
        assert params["stem"]["conv"].shape == (7, 7, 3, c)
        # down block 0, slot 0: layer in = c, bottleneck out = neck*growth
        blk = params["hg"]["down"][0]
        assert blk["layers"][0]["bottleneck"]["conv"].shape == (
            1, 1, c, cfg.bottleneck_chan)
        assert blk["layers"][1]["bottleneck"]["conv"].shape == (
            1, 1, c + cfg.growth_rate, cfg.bottleneck_chan)
        assert blk["adapters_ahead"][0]["conv"].shape == (
            1, 1, c + cfg.growth_rate, c)
        # up block: in 2c, adapter out c (is_up halves)
        upb = params["hg"]["up"][0]
        assert upb["layers"][0]["bottleneck"]["conv"].shape == (
            1, 1, 2 * c, cfg.bottleneck_chan)
        assert upb["adapters_ahead"][0]["conv"].shape == (
            1, 1, 2 * c + cfg.growth_rate, c)
        assert "adapters_skip" not in upb
        # intermedia adapter 0: 2c -> c
        assert params["intermedia"]["adapters"][0]["conv"].shape == (1, 1, 2 * c, c)
        # heads
        assert params["heads"][0]["conv"].shape == (1, 1, c, cfg.class_num)
        assert len(params["heads"]) == cfg.layer_num


class TestForward:
    @pytest.mark.parametrize("layer_num,order,loss_num", [(2, 1, 2), (3, 2, 1), (2, 0, 2)])
    def test_output_shapes(self, layer_num, order, loss_num):
        cfg = ModelConfig(layer_num=layer_num, order=order, loss_num=loss_num, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((2, 32, 32, 3))
        outs, new_state = apply_cu_net(params, state, x, cfg=cfg, train=False)
        assert len(outs) == len(cfg.anchors)
        for o in outs:
            assert o.shape == (2, 8, 8, cfg.class_num)

    def test_train_updates_bn_state(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        _, new_state = apply_cu_net(params, state, x, cfg=cfg, train=True)
        old_mean = state["stem"]["norm"]["mean"]
        new_mean = new_state["stem"]["norm"]["mean"]
        assert not np.allclose(np.asarray(old_mean), np.asarray(new_mean))
        # eval mode leaves state untouched
        _, same_state = apply_cu_net(params, state, x, cfg=cfg, train=False)
        np.testing.assert_allclose(
            np.asarray(same_state["stem"]["norm"]["mean"]), np.asarray(old_mean)
        )

    def test_coupling_uses_previous_unet_features(self):
        """Order-1 coupling: perturbing U-Net-0-only weights must change the
        FIFO features consumed by U-Net 1 (cross-U-Net gradient flow)."""
        cfg = ModelConfig(layer_num=2, order=1, loss_num=1, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))

        def loss(slot0_conv):
            p = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy tree
            p["hg"]["down"][0]["layers"][0]["conv2"] = slot0_conv
            outs, _ = apply_cu_net(p, state, x, cfg=cfg, train=False)
            return jnp.sum(outs[-1] ** 2)  # only the LAST U-Net is supervised

        g = jax.grad(loss)(params["hg"]["down"][0]["layers"][0]["conv2"])
        assert float(jnp.max(jnp.abs(g))) > 0

    @pytest.mark.parametrize("remat", ["bottleneck", "block"])
    def test_remat_policies_agree(self, remat):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, remat=remat, **SMALL)
        cfg_ref = ModelConfig(layer_num=2, order=1, loss_num=2, remat="none", **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_ref)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))

        def loss(params, cfg):
            outs, _ = apply_cu_net(params, state, x, cfg=cfg, train=True)
            return sum(jnp.mean(o**2) for o in outs)

        v0, g0 = jax.value_and_grad(lambda p: loss(p, cfg_ref))(params)
        v1, g1 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestDenseUNet:
    def test_forward_shape(self):
        cfg = DenseUNetConfig(
            layer_num=2, neck_size=2, growth_rate=8, init_chan_num=16, class_num=4,
            num_blocks=2,
        )
        params, state = init_dense_unet(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((2, 32, 32, 3))
        out, _ = apply_dense_unet(params, state, x, cfg=cfg, train=False)
        assert out.shape == (2, 8, 8, 4)

    def test_block_channel_growth(self):
        cfg = DenseUNetConfig(
            layer_num=3, neck_size=2, growth_rate=8, init_chan_num=16, class_num=4,
            num_blocks=2,
        )
        params, _ = init_dense_unet(jax.random.PRNGKey(0), cfg)
        blk = params["hg"]["down"][0]
        # layer i input = in + i*growth (ref:models/naive_dense_unet.py:86-87)
        for i in range(3):
            assert blk["layers"][i]["bottleneck"]["conv"].shape[2] == 16 + i * 8
        # single adapter over in + layer_num*growth (ref :95)
        assert blk["adapter_ahead"]["conv"].shape[2] == 16 + 3 * 8


class TestScanEquivalence:
    @pytest.mark.parametrize("layer_num,order,loss_num,train",
                             [(4, 1, 4, False), (4, 1, 2, True), (4, 0, 2, False)])
    def test_scan_matches_unrolled(self, layer_num, order, loss_num, train):
        """lax.scan over steady-state slots must reproduce the unrolled loop
        bit-for-bit (outputs AND BN-state updates)."""
        cfg_s = ModelConfig(layer_num=layer_num, order=order, loss_num=loss_num,
                            use_scan=True, **SMALL)
        cfg_u = ModelConfig(layer_num=layer_num, order=order, loss_num=loss_num,
                            use_scan=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_u)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        o_s, st_s = apply_cu_net(params, state, x, cfg=cfg_s, train=train)
        o_u, st_u = apply_cu_net(params, state, x, cfg=cfg_u, train=train)
        assert len(o_s) == len(o_u)
        for a, b in zip(o_s, o_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(st_s), jax.tree_util.tree_leaves(st_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def test_scan_grads_match(self):
        cfg_s = ModelConfig(layer_num=4, order=1, loss_num=2, use_scan=True, **SMALL)
        cfg_u = ModelConfig(layer_num=4, order=1, loss_num=2, use_scan=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_u)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))

        def loss(p, cfg):
            outs, _ = apply_cu_net(p, state, x, cfg=cfg, train=True)
            return sum(jnp.mean(o**2) for o in outs)

        g_s = jax.grad(lambda p: loss(p, cfg_s))(params)
        g_u = jax.grad(lambda p: loss(p, cfg_u))(params)
        # scan changes the accumulation order of the backward pass; a few
        # near-zero grads see ~1e-5 absolute noise
        for a, b in zip(jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)


class TestMosaicGate:
    """Tiny channel widths must fall back to the lax path on real TPU
    (Mosaic 'unsupported shape cast'); CPU interpret keeps running them."""

    def test_tiny_width_gated_off_tpu(self, monkeypatch):
        from cunet_tpu.models import cu_net as m

        tiny = ModelConfig(layer_num=2, order=1, loss_num=2, class_num=4,
                           neck_size=2, growth_rate=8, init_chan_num=16,
                           num_blocks=2)
        flag = ModelConfig(layer_num=8, order=1, class_num=16, loss_num=8)
        assert m._mosaic_ok(tiny)          # cpu backend in tests
        assert m._mosaic_ok(flag)
        monkeypatch.setattr(m.jax, "default_backend", lambda: "tpu")
        assert not m._mosaic_ok(tiny)
        assert m._mosaic_ok(flag)
