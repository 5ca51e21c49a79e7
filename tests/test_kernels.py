"""Pallas kernel tests (interpret mode on CPU) vs the lax reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig
from cunet_tpu.kernels.fused_bottleneck import _row_tile, fused_bottleneck_infer
from cunet_tpu.models import apply_cu_net, init_cu_net
from cunet_tpu.ops import dense_bottleneck, init_bn, init_bn_state
from cunet_tpu.ops.layers import bn_inference_scale_shift

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4, num_blocks=2)


class TestRowTile:
    def test_divisor_selection(self):
        assert _row_tile(131072) == 512
        assert _row_tile(128) == 128
        assert _row_tile(24) == 24
        assert _row_tile(20) == 0  # not a multiple of 8
        assert _row_tile(8) == 8


class TestFusedBottleneckKernel:
    def _setup(self, dtype=jnp.float32):
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        feats = [
            jax.random.normal(ks[0], (2, 8, 8, 16), dtype),
            jax.random.normal(ks[1], (2, 8, 8, 32), dtype),
            jax.random.normal(ks[2], (2, 8, 8, 8), dtype),
        ]
        ctot, cout = 56, 24
        params = {
            "norm": init_bn(ks[3], ctot),
            "conv": jax.random.normal(ks[4], (1, 1, ctot, cout)) * 0.1,
        }
        state = init_bn_state(ctot)
        # non-trivial running stats
        state = {
            "mean": jax.random.normal(ks[5], (ctot,)) * 0.1,
            "var": jax.random.uniform(ks[6], (ctot,)) + 0.5,
        }
        return feats, params, state

    def test_matches_lax_eval(self):
        feats, params, state = self._setup()
        inv, shift = bn_inference_scale_shift(params["norm"], state)
        got = fused_bottleneck_infer(
            feats, inv, shift, params["conv"], interpret=True
        )
        want, _ = dense_bottleneck(feats, params, state, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self):
        feats, params, state = self._setup(jnp.bfloat16)
        inv, shift = bn_inference_scale_shift(params["norm"], state)
        got = fused_bottleneck_infer(feats, inv, shift, params["conv"], interpret=True)
        want, _ = dense_bottleneck(feats, params, state, train=False)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_odd_rows_fall_back(self):
        """Row counts that don't tile to multiples of 8 use the lax path."""
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        feats = [jax.random.normal(ks[0], (1, 5, 4, 16))]  # m = 20
        params = {
            "norm": init_bn(ks[1], 16),
            "conv": jax.random.normal(ks[2], (1, 1, 16, 8)) * 0.1,
        }
        state = init_bn_state(16)
        inv, shift = bn_inference_scale_shift(params["norm"], state)
        got = fused_bottleneck_infer(feats, inv, shift, params["conv"], interpret=True)
        want, _ = dense_bottleneck(feats, params, state, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


class TestModelPallasDispatch:
    def test_eval_forward_matches(self, monkeypatch):
        """Full model in use_pallas mode (interpret) == lax mode."""
        import cunet_tpu.kernels.fused_block as fblk
        import cunet_tpu.kernels.fused_bottleneck as fb
        import cunet_tpu.kernels.fused_hourglass as fhg

        for mod, name in [
            (fb, "fused_bottleneck_infer"),
            (fb, "fused_dual_bottleneck_infer"),
            (fblk, "fused_dense_block_infer"),
            (fhg, "fused_hourglass_infer"),
        ]:
            orig = getattr(mod, name)
            monkeypatch.setattr(
                mod, name,
                lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}),
            )
        cfg_p = ModelConfig(layer_num=2, order=1, loss_num=2, use_pallas=True, **SMALL)
        cfg_l = ModelConfig(layer_num=2, order=1, loss_num=2, use_pallas=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_p, _ = apply_cu_net(params, state, x, cfg=cfg_p, train=False)
        out_l, _ = apply_cu_net(params, state, x, cfg=cfg_l, train=False)
        np.testing.assert_allclose(
            np.asarray(out_p[-1]), np.asarray(out_l[-1]), rtol=1e-4, atol=1e-4
        )


class TestDualAdapterKernel:
    def test_matches_two_singles(self):
        from cunet_tpu.kernels.fused_bottleneck import fused_dual_bottleneck_infer
        import jax.numpy as jnp

        ks = jax.random.split(jax.random.PRNGKey(3), 10)
        feats = [
            jax.random.normal(ks[0], (2, 8, 8, 16)),
            jax.random.normal(ks[1], (2, 8, 8, 8)),
        ]
        ctot, cout = 24, 16
        inv_a = jax.random.uniform(ks[2], (ctot,)) + 0.5
        sh_a = jax.random.normal(ks[3], (ctot,)) * 0.1
        w_a = jax.random.normal(ks[4], (1, 1, ctot, cout)) * 0.1
        inv_s = jax.random.uniform(ks[5], (ctot,)) + 0.5
        sh_s = jax.random.normal(ks[6], (ctot,)) * 0.1
        w_s = jax.random.normal(ks[7], (1, 1, ctot, cout)) * 0.1

        a, s = fused_dual_bottleneck_infer(
            feats, inv_a, sh_a, w_a, inv_s, sh_s, w_s, interpret=True
        )
        ra = fused_bottleneck_infer(feats, inv_a, sh_a, w_a, interpret=True)
        rs = fused_bottleneck_infer(feats, inv_s, sh_s, w_s, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(ra), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=2e-5, atol=2e-5)


class TestBatchTileSelection:
    """default_batch_tile must respect VMEM: the HBM head/stem DMA frees
    the output window, but K=16 still keeps ~2x resident weights and caps
    at bt=4 on v5e (r5 sweep: 1969.6 img/s at bt4 vs 1935.8 at bt8)."""

    def test_k8_prefers_eight(self):
        from cunet_tpu.kernels.fused_model import default_batch_tile
        assert default_batch_tile(256, 64, 8) == 8

    def test_k16_drops_to_four(self):
        from cunet_tpu.kernels.fused_model import default_batch_tile
        assert default_batch_tile(256, 64, 16) == 4
        assert default_batch_tile(254, 64, 16) == 2  # 2-divisible batch
        assert default_batch_tile(255, 64, 16) == 1  # odd batch

    def test_env_override(self, monkeypatch):
        from cunet_tpu.kernels.fused_model import default_batch_tile
        monkeypatch.setenv("CUNET_TERA_BATCH_TILE", "4")
        assert default_batch_tile(256, 64, 8) == 4


class TestConv3x3Modes:
    """All in-kernel 3x3 conv formulations (kernels/fused_hourglass.py
    _conv3x3: taps / onedot / scatter x {post,pre}-pad x {flat9,tree2}) must
    agree. The pre-pad variant relies on padding commuting with the
    per-position matmul (zero input rows dot to zero tap rows)."""

    def test_all_modes_agree(self, monkeypatch):
        import cunet_tpu.kernels.fused_hourglass as fh

        rng = np.random.RandomState(0)
        b, h, w, cb, g = 2, 8, 6, 16, 8
        y2 = jnp.asarray(rng.randn(b * h * w, cb), jnp.float32)
        w3 = jnp.asarray(rng.randn(3, 3, cb, g) * 0.1, jnp.float32)
        ref = fh._conv3x3(y2, w3, b, h, w, mode="taps")
        assert ref.shape == (b * h * w, g)
        one = fh._conv3x3(y2, w3, b, h, w, mode="onedot")
        np.testing.assert_allclose(np.asarray(one), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        wp = fh.pack_w3_scatter(w3)
        for pad in ("post", "pre"):
            for add in ("flat9", "tree2"):
                monkeypatch.setattr(fh, "_SCATTER_PAD", pad)
                monkeypatch.setattr(fh, "_SCATTER_ADD", add)
                got = fh._conv3x3(y2, wp, b, h, w, mode="scatter")
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4,
                    err_msg=f"scatter pad={pad} add={add}")


class TestBf16Prologue:
    """CUNET_KERNEL_BF16_PROLOGUE=1 runs the BN affine+relu prologues in
    bf16 (halves their VPU bytes). Model-level parity vs the f32 prologue
    within bf16 tolerance — the knob must stay shippable."""

    def test_model_parity(self, monkeypatch):
        import cunet_tpu.kernels.fused_hourglass as fh

        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, use_pallas=True,
                          pallas_whole_model=False, compute_dtype="bfloat16",
                          **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3),
                              jnp.bfloat16)
        monkeypatch.setattr(fh, "_BF16_PROLOGUE", False)
        out_f, _ = apply_cu_net(params, state, x, cfg=cfg, train=False)
        monkeypatch.setattr(fh, "_BF16_PROLOGUE", True)
        out_b, _ = apply_cu_net(params, state, x, cfg=cfg, train=False)
        np.testing.assert_allclose(
            np.asarray(out_b[-1], np.float32), np.asarray(out_f[-1], np.float32),
            rtol=0.05, atol=0.05)
