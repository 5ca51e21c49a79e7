"""Mega-kernel tests: whole dense block in one launch vs lax composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.kernels.fused_block import fused_dense_block_infer
from cunet_tpu.kernels.fused_bottleneck import _lax_fallback
from cunet_tpu.ops import conv2d, max_pool_2x2, relu, upsample_nearest_2x


def _lax_block(feats, bv, bw, v2, w3, av, aw, sv=None, sw=None,
               upsample_first=False, pool_ahead=False):
    feats = list(feats)
    if upsample_first:
        feats[0] = upsample_nearest_2x(feats[0])
    y1 = _lax_fallback(feats, bv[0], bv[1], bw)
    y2 = relu(y1.astype(jnp.float32) * v2[0] + v2[1]).astype(y1.dtype)
    out32 = conv2d(y2, w3, stride=1, padding=1)
    x2 = feats + [out32]
    ahead = _lax_fallback(x2, av[0], av[1], aw)
    if pool_ahead:
        ahead = max_pool_2x2(ahead)
    res = [ahead]
    if sw is not None:
        res.append(_lax_fallback(x2, sv[0], sv[1], sw))
    res.append(out32)
    return res


def _setup(h=8, n=2, cs=(16, 8), cb=16, g=8, cout=16, upsample_first=False):
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 20))
    feats = []
    for j, c in enumerate(cs):
        hh = h // 2 if (upsample_first and j == 0) else h
        feats.append(jax.random.normal(next(ks), (n, hh, hh, c)) * 0.5)
    cin = sum(cs)
    mk_vec = lambda c: jnp.stack([
        jax.random.uniform(next(ks), (c,)) + 0.5,
        jax.random.normal(next(ks), (c,)) * 0.1,
    ])
    bv = mk_vec(cin)
    bw = jax.random.normal(next(ks), (1, 1, cin, cb)) * 0.2
    v2 = mk_vec(cb)
    w3 = jax.random.normal(next(ks), (3, 3, cb, g)) * 0.2
    av = mk_vec(cin + g)
    aw = jax.random.normal(next(ks), (1, 1, cin + g, cout)) * 0.2
    sv = mk_vec(cin + g)
    sw = jax.random.normal(next(ks), (1, 1, cin + g, cout)) * 0.2
    return feats, bv, bw, v2, w3, av, aw, sv, sw


class TestFusedBlock:
    def test_down_block_with_skip_and_pool(self):
        feats, bv, bw, v2, w3, av, aw, sv, sw = _setup()
        got = fused_dense_block_infer(
            feats, bv, bw, v2, w3, av, aw, sv, sw,
            pool_ahead=True, emit_layer_out=True, interpret=True,
        )
        want = _lax_block(feats, bv, bw, v2, w3, av, aw, sv, sw, pool_ahead=True)
        assert len(got) == 3
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-5)

    def test_neck_block_plain(self):
        feats, bv, bw, v2, w3, av, aw, _, _ = _setup(cs=(16,))
        got = fused_dense_block_infer(
            feats, bv, bw, v2, w3, av, aw, interpret=True,
        )
        want = _lax_block(feats, bv, bw, v2, w3, av, aw)
        assert len(got) == 2  # ahead + layer_out
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-5)

    def test_up_block_with_upsample(self):
        feats, bv, bw, v2, w3, av, aw, _, _ = _setup(h=8, cs=(16, 8), upsample_first=True)
        got = fused_dense_block_infer(
            feats, bv, bw, v2, w3, av, aw,
            upsample_first=True, interpret=True,
        )
        want = _lax_block(feats, bv, bw, v2, w3, av, aw, upsample_first=True)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-5)

    def test_bf16(self):
        feats, bv, bw, v2, w3, av, aw, sv, sw = _setup()
        feats = [f.astype(jnp.bfloat16) for f in feats]
        got = fused_dense_block_infer(
            feats, bv, bw, v2, w3, av, aw, sv, sw, interpret=True,
        )
        want = _lax_block(feats, bv, bw, v2, w3, av, aw, sv, sw)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=3e-2, atol=3e-2,
            )


class TestFusedScanModel:
    @pytest.mark.parametrize("hourglass", [True, False])
    def test_k4_eval_pallas_matches_lax(self, monkeypatch, hourglass):
        """K=4 exercises the scanned fused eval paths (per-block kernels and
        the whole-slot giga-kernel)."""
        import cunet_tpu.kernels.fused_block as fblk
        import cunet_tpu.kernels.fused_bottleneck as fb
        import cunet_tpu.kernels.fused_hourglass as fhg
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net

        for mod, name in [(fblk, "fused_dense_block_infer"),
                          (fb, "fused_bottleneck_infer"),
                          (fb, "fused_dual_bottleneck_infer"),
                          (fhg, "fused_hourglass_infer")]:
            orig = getattr(mod, name)
            monkeypatch.setattr(mod, name,
                                lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))

        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2)
        cfg_p = ModelConfig(layer_num=4, order=1, loss_num=4, use_pallas=True,
                            pallas_hourglass=hourglass, use_scan=True, **SMALL)
        cfg_l = ModelConfig(layer_num=4, order=1, loss_num=4, use_pallas=False,
                            use_scan=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_p, _ = apply_cu_net(params, state, x, cfg=cfg_p, train=False)
        out_l, _ = apply_cu_net(params, state, x, cfg=cfg_l, train=False)
        assert len(out_p) == len(out_l) == 4
        for a, b in zip(out_p, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


class TestChunkPlan:
    def test_splits_high_res_only(self):
        from cunet_tpu.kernels.fused_model_buf import chunk_plan
        plan = chunk_plan(4, 64, 3, rows_target=8192)
        # 4*64*64 = 16384 rows > 8192 -> split to 2 images; 4*32*32 fits
        assert plan == {64: 2, 32: 4, 16: 4, 8: 4}

    def test_never_below_one_image(self):
        from cunet_tpu.kernels.fused_model_buf import chunk_plan
        plan = chunk_plan(2, 64, 2, rows_target=1024)
        assert plan[64] == 1 and plan[32] == 1 and plan[16] == 2

    def test_env_override(self, monkeypatch):
        from cunet_tpu.kernels.fused_model_buf import chunk_plan
        monkeypatch.setenv("CUNET_TERA_CHUNK_ROWS", "1024")
        assert chunk_plan(2, 64, 1) == {64: 1, 32: 1}


class TestFusedWholeModel:
    @pytest.mark.parametrize("impl", ["loop", "buf"])
    @pytest.mark.parametrize("order,loss", [(1, 2), (2, 5), (0, 2), (3, 6)])
    def test_tera_kernel_matches_lax(self, monkeypatch, order, loss, impl):
        import cunet_tpu.kernels.fused_model as fm
        import cunet_tpu.kernels.fused_model_buf as fmb
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net

        monkeypatch.setenv("CUNET_TERA_IMPL", impl)
        for mod, name in [(fm, "fused_model_infer"),
                          (fm, "fused_model_loop_infer"),
                          (fmb, "fused_model_buf_infer")]:
            orig = getattr(mod, name)
            monkeypatch.setattr(mod, name,
                                lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2)
        K = {2: 4, 5: 5, 6: 6}[loss]
        cfg_p = ModelConfig(layer_num=K, order=order, loss_num=loss,
                            use_pallas=True, pallas_whole_model=True, **SMALL)
        cfg_l = ModelConfig(layer_num=K, order=order, loss_num=loss,
                            use_pallas=False, use_scan=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_p, _ = apply_cu_net(params, state, x, cfg=cfg_p, train=False)
        out_l, _ = apply_cu_net(params, state, x, cfg=cfg_l, train=False)
        assert len(out_p) == len(out_l) == loss
        for a, b in zip(out_p, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_buf_kernel_chunked_stages_match_lax(self, monkeypatch):
        """Force the per-stage image-chunk loop (CUNET_TERA_CHUNK_ROWS small
        enough that the high-res stages split the batch tile) and assert the
        chunked dataflow is bit-compatible with the lax model."""
        import cunet_tpu.kernels.fused_model_buf as fmb
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net

        monkeypatch.setenv("CUNET_TERA_IMPL", "buf")
        # stem h0 = 8 here: 2*8*8=128 rows > 64 -> stage chunks of 1 image
        # at res 8, whole tile (2) at res <= 4: exercises mixed chunking
        monkeypatch.setenv("CUNET_TERA_CHUNK_ROWS", "64")
        monkeypatch.setenv("CUNET_TERA_BATCH_TILE", "2")
        orig = fmb.fused_model_buf_infer
        monkeypatch.setattr(
            fmb, "fused_model_buf_infer",
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2)
        cfg_p = ModelConfig(layer_num=4, order=2, loss_num=4,
                            use_pallas=True, pallas_whole_model=True, **SMALL)
        cfg_l = ModelConfig(layer_num=4, order=2, loss_num=4,
                            use_pallas=False, use_scan=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_p, _ = apply_cu_net(params, state, x, cfg=cfg_p, train=False)
        out_l, _ = apply_cu_net(params, state, x, cfg=cfg_l, train=False)
        for a, b in zip(out_p, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_buf_kernel_fori_scatter_pre_tree2_matches_lax(self, monkeypatch):
        """The r4 shipping combination through the tera kernel: fori chunk
        loop (bounded compile — non-fori scatter times out Mosaic at
        K8-bt8), scatter conv with pre-padded input, tree2 two-level tap
        gather. Must match the lax model."""
        import cunet_tpu.kernels.fused_hourglass as fh
        import cunet_tpu.kernels.fused_model_buf as fmb
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net

        monkeypatch.setenv("CUNET_TERA_IMPL", "buf")
        monkeypatch.setenv("CUNET_TERA_CHUNK_ROWS", "64")
        monkeypatch.setenv("CUNET_TERA_BATCH_TILE", "2")
        monkeypatch.setenv("CUNET_CHUNK_LOOP", "fori")
        monkeypatch.setattr(fh, "_CONV3X3_MODE", "scatter")
        monkeypatch.setattr(fh, "_SCATTER_PAD", "pre")
        monkeypatch.setattr(fh, "_SCATTER_ADD", "tree2")
        orig = fmb.fused_model_buf_infer
        monkeypatch.setattr(
            fmb, "fused_model_buf_infer",
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2)
        cfg_p = ModelConfig(layer_num=4, order=2, loss_num=4,
                            use_pallas=True, pallas_whole_model=True, **SMALL)
        cfg_l = ModelConfig(layer_num=4, order=2, loss_num=4,
                            use_pallas=False, use_scan=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_p, _ = apply_cu_net(params, state, x, cfg=cfg_p, train=False)
        out_l, _ = apply_cu_net(params, state, x, cfg=cfg_l, train=False)
        for a, b in zip(out_p, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_buf_kernel_lowdot_matches_lax(self, monkeypatch):
        """CUNET_UPS_DOT=low (the ups/dot commute): the up-block dots'
        ups-lane contribution is computed at the producer's resolution and
        upsampled as a dot RESULT (fused_model_buf._UPS_DOT). Exact up to
        f32 summation order, so it must match the lax model at the same
        tolerance as the default path — including mixed stage chunking."""
        import cunet_tpu.kernels.fused_model_buf as fmb
        from cunet_tpu.config import ModelConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net

        monkeypatch.setenv("CUNET_TERA_IMPL", "buf")
        monkeypatch.setenv("CUNET_TERA_CHUNK_ROWS", "64")
        monkeypatch.setenv("CUNET_TERA_BATCH_TILE", "2")
        monkeypatch.setattr(fmb, "_UPS_DOT", "low")
        orig = fmb.fused_model_buf_infer
        monkeypatch.setattr(
            fmb, "fused_model_buf_infer",
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2)
        cfg_p = ModelConfig(layer_num=4, order=2, loss_num=4,
                            use_pallas=True, pallas_whole_model=True, **SMALL)
        cfg_l = ModelConfig(layer_num=4, order=2, loss_num=4,
                            use_pallas=False, use_scan=False, **SMALL)
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_p, _ = apply_cu_net(params, state, x, cfg=cfg_p, train=False)
        out_l, _ = apply_cu_net(params, state, x, cfg=cfg_l, train=False)
        for a, b in zip(out_p, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
