"""ops/dropmask.py — the counter-hash dropout-mask PRNG shared by the lax
path and the fused train kernels (drop_impl="prng").

The load-bearing property is BIT-IDENTITY between three producers of the
same mask: the pure-jnp helper, the same helper traced inside a Pallas
kernel, and the batched lax reconstruction — that is what keeps fused-vs-lax
dropout parity exact without streaming masks from HBM."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cunet_tpu.ops import dropmask


class TestTileMask:
    def test_distribution_and_values(self):
        m = np.asarray(dropmask.tile_mask(jnp.int32(77), 2, 0, 8192, 32,
                                          0.25, jnp.float32))
        vals = np.unique(m)
        assert set(vals.tolist()) <= {0.0, np.float32(1.0 / 0.75)}
        # scaled mask has unit mean; 512k samples -> ~0.1% sampling noise
        assert abs(m.mean() - 1.0) < 0.01
        keep_frac = (m != 0).mean()
        assert abs(keep_frac - 0.75) < 0.01

    def test_deterministic_and_key_sensitive(self):
        a = np.asarray(dropmask.tile_mask(jnp.int32(5), 1, 3, 1024, 16,
                                          0.5, jnp.float32))
        b = np.asarray(dropmask.tile_mask(jnp.int32(5), 1, 3, 1024, 16,
                                          0.5, jnp.float32))
        assert (a == b).all()
        for seed, pos, t in ((6, 1, 3), (5, 2, 3), (5, 1, 4)):
            c = np.asarray(dropmask.tile_mask(jnp.int32(seed), pos, t,
                                              1024, 16, 0.5, jnp.float32))
            assert not (a == c).all(), (seed, pos, t)

    def test_lag_decorrelated(self):
        m = np.asarray(dropmask.tile_mask(jnp.int32(123), 0, 0, 8192, 32,
                                          0.5, jnp.float32))
        b = (m != 0).astype(np.float64).ravel()
        for lag in (1, 32, 33):
            r = np.corrcoef(b[:-lag], b[lag:])[0, 1]
            assert abs(r) < 0.02, (lag, r)

    def test_rate_validation(self):
        with pytest.raises(ValueError):
            dropmask.keep_threshold(0.0)
        with pytest.raises(ValueError):
            dropmask.keep_threshold(1.0)


class TestKernelParity:
    def test_kernel_equals_lax_bitwise(self):
        """The SAME helper traced inside a (grid-tiled) Pallas kernel yields
        the exact bits of the batched lax reconstruction — the contract that
        makes fused-vs-lax dropout bit-identical under drop_impl="prng"."""
        bt, h, g, rate = 2, 16, 8, 0.25
        n = 6
        seed = dropmask.derive_seed(jax.random.PRNGKey(3))

        def kern(pos, seed_ref, o_ref):
            m = dropmask.tile_mask(seed_ref[0], pos, pl.program_id(0),
                                   bt * h * h, g, rate, jnp.float32)
            o_ref[...] = m.reshape(bt, h, h, g)

        for pos in (0, 3, 8):
            out = pl.pallas_call(
                functools.partial(kern, pos),
                grid=(n // bt,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec((bt, h, h, g),
                                       lambda i: (i, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((n, h, h, g), jnp.float32),
                interpret=True,
            )(seed)
            ref = dropmask.batch_mask(seed, pos, (n, h, h, g), bt, rate,
                                      jnp.float32)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_batch_mask_single_tile_fallback(self):
        seed = jnp.array([11], jnp.int32)
        a = dropmask.batch_mask(seed, 1, (4, 8, 8, 16), 0, 0.5, jnp.float32)
        b = dropmask.tile_mask(seed, 1, 0, 4 * 64, 16, 0.5,
                               jnp.float32).reshape(4, 8, 8, 16)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedSeedMode:
    def test_fused_seed_equals_fused_masks_from_generator(self):
        """fused drop_seed mode == fused masks mode when the masks are the
        generator's own output: proves the kernels consume the seed exactly
        as documented (pos = traversal order, t = grid step)."""
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.kernels.train_slot import fused_slot_train, marshal_slot
        from cunet_tpu.models import init_cu_net
        from cunet_tpu.models.cu_net import _slot_subtree, empty_fifos

        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, class_num=4,
                          neck_size=2, growth_rate=8, init_chan_num=16,
                          num_blocks=2, bn_tile=2, compute_dtype="float32",
                          drop_rate=0.5, use_pallas=True)
        params, _ = init_cu_net(jax.random.PRNGKey(0), cfg)
        p0 = _slot_subtree(params, 0, cfg)
        W = marshal_slot(p0, cfg.num_blocks)
        W.pop("inter", None)
        y = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 16),
                              jnp.float32)
        fifos = [[] for _ in range(2 * cfg.num_blocks + 1)]
        seed = dropmask.derive_seed(jax.random.PRNGKey(9))

        outs_seed = fused_slot_train(
            y, [], fifos, W, cfg=cfg, L=0, has_inter=False,
            interpret=True, drop_seed=seed)

        # reconstruct the masks the kernel must have used
        nb = cfg.num_blocks
        res_of = [32 // (2 ** j) for j in range(nb + 1)]
        trav_res = res_of[:nb] + [res_of[nb]] + res_of[:nb][::-1]
        masks = [dropmask.batch_mask(seed, pos, (4, r, r, cfg.growth_rate),
                                     cfg.bn_tile, cfg.drop_rate, jnp.float32)
                 for pos, r in enumerate(trav_res)]
        outs_masks = fused_slot_train(
            y, [], fifos, W, cfg=cfg, L=0, has_inter=False,
            interpret=True, masks=masks)

        fa = jax.tree_util.tree_leaves(outs_seed)
        fb = jax.tree_util.tree_leaves(outs_masks)
        assert len(fa) == len(fb)
        for a, b in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
