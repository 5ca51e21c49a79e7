"""Fused TRAIN bottleneck kernel: forward + custom-VJP vs the lax train path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.kernels.train_bottleneck import fused_train_bottleneck
from cunet_tpu.ops import dense_bottleneck, init_bn_state


def _setup(key=0, shapes=((2, 8, 8, 16), (2, 8, 8, 32))):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    feats = tuple(
        jax.random.normal(ks[i], s) for i, s in enumerate(shapes)
    )
    ctot = sum(s[-1] for s in shapes)
    cout = 24
    scale = jax.random.uniform(ks[4], (ctot,)) + 0.5
    bias = jax.random.normal(ks[5], (ctot,)) * 0.1
    w = jax.random.normal(ks[6], (1, 1, ctot, cout)) * 0.1
    return feats, scale, bias, w, ctot


def _lax_train(feats, scale, bias, w):
    params = {"norm": {"scale": scale, "bias": bias}, "conv": w}
    state = init_bn_state(w.shape[2])
    out, ns = dense_bottleneck(list(feats), params, state, train=True)
    return out


class TestFusedTrainBottleneck:
    def test_forward_matches_lax(self):
        feats, scale, bias, w, ctot = _setup()
        out, mean, var = fused_train_bottleneck(
            feats, scale, bias, w, 1e-5, True
        )
        want = _lax_train(feats, scale, bias, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)
        # stats match the concat's batch stats
        cat = jnp.concatenate([f.reshape(-1, f.shape[-1]) for f in feats], axis=-1)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(cat.mean(0)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), np.asarray(cat.var(0)),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_match_lax(self):
        feats, scale, bias, w, ctot = _setup()
        tgt = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 24))

        def loss_fused(feats, scale, bias, w):
            out, _, _ = fused_train_bottleneck(feats, scale, bias, w, 1e-5, True)
            return jnp.mean((out - tgt) ** 2)

        def loss_lax(feats, scale, bias, w):
            out = _lax_train(feats, scale, bias, w)
            return jnp.mean((out - tgt) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(feats, scale, bias, w)
        gl = jax.grad(loss_lax, argnums=(0, 1, 2, 3))(feats, scale, bias, w)
        for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gl)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_single_feature(self):
        feats, scale, bias, w, _ = _setup(shapes=((2, 8, 8, 16),))

        def loss(feats):
            out, _, _ = fused_train_bottleneck(feats, scale, bias, w, 1e-5, True)
            return jnp.sum(out**2)

        g = jax.grad(loss)(feats)
        out = _lax_train(feats, scale, bias, w)

        def loss_lax(feats):
            return jnp.sum(_lax_train(feats, scale, bias, w) ** 2)

        gl = jax.grad(loss_lax)(feats)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gl[0]),
                                   rtol=2e-4, atol=2e-5)

    def test_memory_o1_residuals(self):
        """The VJP must save only inputs+stats, not the concat/relu
        intermediates (the reference's shared-storage capability)."""
        feats, scale, bias, w, ctot = _setup()
        _, vjp_fn = jax.vjp(
            lambda f: fused_train_bottleneck(f, scale, bias, w, 1e-5, True)[0],
            feats,
        )
        # residual byte count ~ inputs + params (a saved concat or relu
        # output would add m*ctot floats on top)
        leaves = jax.tree_util.tree_leaves(vjp_fn)
        saved = sum(np.prod(x.shape) for x in leaves if hasattr(x, "shape"))
        m = 2 * 8 * 8
        input_size = m * ctot + 2 * ctot + ctot * 24
        assert saved < input_size * 2.1  # inputs (+w copies), no big extras


class TestModelTrainPallas:
    def test_train_step_matches_lax(self, monkeypatch):
        """Full model training grads: pallas train kernel == lax path."""
        import cunet_tpu.kernels.train_bottleneck as tk
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net

        orig = tk.fused_train_bottleneck
        monkeypatch.setattr(
            tk, "fused_train_bottleneck",
            lambda f, s, b, w, eps=1e-5, interp=False: orig(f, s, b, w, eps, True),
        )
        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2)
        cfg_p = ModelConfig(layer_num=2, order=1, loss_num=2, use_pallas=True, **SMALL)
        cfg_l = ModelConfig(layer_num=2, order=1, loss_num=2, use_pallas=False,
                            remat="none", **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

        def loss(p, cfg):
            outs, ns = apply_cu_net(p, state, x, cfg=cfg, train=True)
            return sum(jnp.mean(o**2) for o in outs), ns

        (v_p, ns_p), g_p = jax.value_and_grad(
            lambda p: loss(p, cfg_p), has_aux=True)(params)
        (v_l, ns_l), g_l = jax.value_and_grad(
            lambda p: loss(p, cfg_l), has_aux=True)(params)
        np.testing.assert_allclose(float(v_p), float(v_l), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_l)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ns_p), jax.tree_util.tree_leaves(ns_l)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
