"""Unit tests for core ops: BN parity with torch, concat-free bottleneck."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cunet_tpu.ops import (
    batch_norm,
    conv2d,
    dense_bottleneck,
    dense_bottleneck_remat,
    init_bn,
    init_bn_state,
    max_pool_2x2,
    relu,
    upsample_nearest_2x,
)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float32)


class TestBatchNormTorchParity:
    """BN must match torch.nn.BatchNorm2d (the reference's normalizer)."""

    @pytest.mark.parametrize("train", [True, False])
    def test_matches_torch(self, train):
        n, h, w, c = 4, 6, 6, 8
        x = np.random.RandomState(0).randn(n, h, w, c).astype(np.float32)
        scale = np.random.RandomState(1).rand(c).astype(np.float32)
        bias = np.random.RandomState(2).randn(c).astype(np.float32) * 0.1
        rmean = np.random.RandomState(3).randn(c).astype(np.float32) * 0.1
        rvar = np.random.RandomState(4).rand(c).astype(np.float32) + 0.5

        tbn = torch.nn.BatchNorm2d(c)
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(scale))
            tbn.bias.copy_(torch.from_numpy(bias))
            tbn.running_mean.copy_(torch.from_numpy(rmean))
            tbn.running_var.copy_(torch.from_numpy(rvar))
        tbn.train(train)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ty = tbn(tx).permute(0, 2, 3, 1).detach().numpy()

        params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
        state = {"mean": jnp.asarray(rmean), "var": jnp.asarray(rvar)}
        y, new_state = batch_norm(jnp.asarray(x), params, state, train=train)

        np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_state["var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
        )


class TestConvTorchParity:
    @pytest.mark.parametrize("kh,stride,pad", [(1, 1, 0), (3, 1, 1), (7, 2, 3)])
    def test_matches_torch(self, kh, stride, pad):
        n, h, w, cin, cout = 2, 16, 16, 5, 7
        x = np.random.RandomState(0).randn(n, h, w, cin).astype(np.float32)
        wgt = np.random.RandomState(1).randn(kh, kh, cin, cout).astype(np.float32) * 0.1

        ty = torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(wgt).permute(3, 2, 0, 1),
            stride=stride,
            padding=pad,
        ).permute(0, 2, 3, 1).numpy()
        y = conv2d(jnp.asarray(x), jnp.asarray(wgt), stride=stride, padding=pad)
        np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)


class TestPoolUpsample:
    def test_maxpool_matches_torch(self):
        x = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)
        ty = torch.nn.functional.max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(max_pool_2x2(jnp.asarray(x))), ty)

    def test_upsample_matches_torch(self):
        x = np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32)
        ty = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(upsample_nearest_2x(jnp.asarray(x))), ty)


def _naive_bottleneck(features, params, state, train):
    """Reference semantics: materialized concat -> BN -> ReLU -> 1x1."""
    x = jnp.concatenate(features, axis=-1)
    p = {"scale": params["norm"]["scale"], "bias": params["norm"]["bias"]}
    y, ns = batch_norm(x, p, state, train=train)
    y = relu(y)
    return conv2d(y, params["conv"], stride=1, padding=0), ns


class TestDenseBottleneck:
    def _setup(self, key=0):
        ks = jax.random.split(jax.random.PRNGKey(key), 8)
        feats = [
            jax.random.normal(ks[0], (2, 8, 8, 16)),
            jax.random.normal(ks[1], (2, 8, 8, 32)),
            jax.random.normal(ks[2], (2, 8, 8, 8)),
        ]
        ctot, cout = 56, 24
        params = {
            "norm": init_bn(ks[3], ctot),
            "conv": jax.random.normal(ks[4], (1, 1, ctot, cout)) * 0.1,
        }
        state = init_bn_state(ctot)
        return feats, params, state

    @pytest.mark.parametrize("train", [True, False])
    def test_matches_concat(self, train):
        feats, params, state = self._setup()
        out, ns = dense_bottleneck(feats, params, state, train=train)
        ref, rns = _naive_bottleneck(feats, params, state, train)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(ns["mean"]), np.asarray(rns["mean"]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ns["var"]), np.asarray(rns["var"]), rtol=1e-5, atol=1e-6
        )

    def test_remat_same_values_and_grads(self):
        feats, params, state = self._setup()

        def loss_plain(params, feats):
            out, _ = dense_bottleneck(feats, params, state, train=True)
            return jnp.sum(out**2)

        def loss_remat(params, feats):
            out, _ = dense_bottleneck_remat(feats, params, state, train=True)
            return jnp.sum(out**2)

        v1, g1 = jax.value_and_grad(loss_plain, argnums=(0, 1))(params, feats)
        v2, g2 = jax.value_and_grad(loss_remat, argnums=(0, 1))(params, feats)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            ),
            g1,
            g2,
        )

    def test_grad_matches_concat_formulation(self):
        feats, params, state = self._setup()

        def loss_fused(feats):
            out, _ = dense_bottleneck(feats, params, state, train=True)
            return jnp.sum(jnp.sin(out))

        def loss_naive(feats):
            out, _ = _naive_bottleneck(feats, params, state, True)
            return jnp.sum(jnp.sin(out))

        g1 = jax.grad(loss_fused)(feats)
        g2 = jax.grad(loss_naive)(feats)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


class TestConv3x3Scatter:
    def test_matches_conv2d_fwd_and_grads(self):
        """conv3x3_scatter must equal conv2d(padding=1) in value AND in both
        input/weight gradients (it is the train-path formulation)."""
        import jax
        import jax.numpy as jnp
        from cunet_tpu.ops import conv2d
        from cunet_tpu.ops.layers import conv3x3_scatter

        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 6, 5, 16).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, 16, 8).astype(np.float32) * 0.2)
        got = conv3x3_scatter(x, w)
        want = conv2d(x, w, stride=1, padding=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        g = jnp.asarray(rs.randn(*want.shape).astype(np.float32))
        f1 = lambda x, w: jnp.sum(conv3x3_scatter(x, w) * g)
        f2 = lambda x, w: jnp.sum(conv2d(x, w, stride=1, padding=1) * g)
        gx1, gw1 = jax.grad(f1, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(f2, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=1e-4, atol=1e-4)

    def test_model_level_scatter_matches_lax(self):
        import jax
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net

        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2)
        cfg_s = ModelConfig(layer_num=2, order=1, loss_num=2,
                            conv3x3_impl="scatter", **SMALL)
        cfg_l = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_s, _ = apply_cu_net(params, state, x, cfg=cfg_s, train=False)
        out_l, _ = apply_cu_net(params, state, x, cfg=cfg_l, train=False)
        for a, b in zip(out_s, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
