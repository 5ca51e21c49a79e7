"""Ghost/per-replica BN (cfg.bn_tile): per-tile batch statistics.

The reference trains under DataParallel, so its BN layers compute statistics
per GPU shard (ref:cu-net.py:59); ``bn_tile`` reproduces that semantics and
is the stat granularity of the fused train kernels. These tests pin the
tiling algebra against the untiled op applied per shard.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cunet_tpu.config import ModelConfig
from cunet_tpu.models import apply_cu_net, init_cu_net
from cunet_tpu.ops import batch_norm, dense_bottleneck, init_bn, init_bn_state


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


class TestGhostBatchNorm:
    def test_tiled_equals_per_shard(self):
        k = jax.random.PRNGKey(0)
        x = _rand(k, (4, 8, 8, 16))
        params = init_bn(jax.random.PRNGKey(1), 16)
        state = init_bn_state(16)
        y, ns = batch_norm(x, params, state, train=True, tile=2)
        # oracle: run the untiled op on each shard independently
        y0, ns0 = batch_norm(x[:2], params, state, train=True)
        y1, ns1 = batch_norm(x[2:], params, state, train=True)
        np.testing.assert_allclose(y, jnp.concatenate([y0, y1]), rtol=2e-6,
                                   atol=2e-6)
        # running stats update with the tile-average statistics
        for key_ in ("mean", "var"):
            np.testing.assert_allclose(
                ns[key_], (ns0[key_] + ns1[key_]) / 2, rtol=2e-6, atol=2e-6
            )

    def test_tile_equals_batch_when_full(self):
        x = _rand(jax.random.PRNGKey(2), (4, 4, 4, 8))
        params = init_bn(jax.random.PRNGKey(3), 8)
        state = init_bn_state(8)
        y_a, ns_a = batch_norm(x, params, state, train=True, tile=4)
        y_b, ns_b = batch_norm(x, params, state, train=True)
        np.testing.assert_array_equal(y_a, y_b)
        np.testing.assert_array_equal(ns_a["mean"], ns_b["mean"])

    def test_dense_bottleneck_tiled(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(4))
        feats = [_rand(k1, (4, 4, 4, 8)), _rand(k2, (4, 4, 4, 4))]
        params = {
            "norm": init_bn(jax.random.PRNGKey(5), 12),
            "conv": _rand(jax.random.PRNGKey(6), (1, 1, 12, 6)),
        }
        state = init_bn_state(12)
        out, ns = dense_bottleneck(feats, params, state, train=True, tile=2)
        o0, ns0 = dense_bottleneck([f[:2] for f in feats], params, state,
                                   train=True)
        o1, ns1 = dense_bottleneck([f[2:] for f in feats], params, state,
                                   train=True)
        np.testing.assert_allclose(out, jnp.concatenate([o0, o1]), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(ns["var"], (ns0["var"] + ns1["var"]) / 2,
                                   rtol=2e-6, atol=2e-6)


class TestGhostModel:
    def test_model_ghost_equals_per_shard_forward(self):
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, class_num=4,
                          neck_size=2, growth_rate=8, init_chan_num=16,
                          num_blocks=2, bn_tile=2, remat="none")
        cfg_g = cfg
        cfg_0 = ModelConfig(layer_num=2, order=1, loss_num=2, class_num=4,
                            neck_size=2, growth_rate=8, init_chan_num=16,
                            num_blocks=2, remat="none")
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg_g)
        x = _rand(jax.random.PRNGKey(1), (4, 32, 32, 3))
        outs, _ = apply_cu_net(params, bn, x, cfg=cfg_g, train=True)
        outs0, _ = apply_cu_net(params, bn, x[:2], cfg=cfg_0, train=True)
        outs1, _ = apply_cu_net(params, bn, x[2:], cfg=cfg_0, train=True)
        for o, o0, o1 in zip(outs, outs0, outs1):
            np.testing.assert_allclose(
                o, jnp.concatenate([o0, o1]), rtol=5e-4, atol=5e-4
            )
