"""Low-bit matmul kernel tests (interpret mode) + multihost helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunet_tpu.kernels.quant_matmul import (
    binarized_matmul_infer,
    int8_matmul_dequant,
    pack_binarized_weight,
    quantize_activations_i8,
)
from cunet_tpu.quant import binarize_weight_value, quan_input


class TestInt8Matmul:
    def test_matches_fp_reference(self):
        rs = np.random.RandomState(0)
        x = rs.randint(-127, 128, (64, 32)).astype(np.int8)
        w = rs.choice([-1, 0, 1], (32, 16)).astype(np.int8)
        cs = rs.rand(16).astype(np.float32)
        got = int8_matmul_dequant(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(cs), 1 / 128,
            interpret=True,
        )
        want = (x.astype(np.float32) @ w.astype(np.float32)) * cs / 128
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)

    def test_fallback_odd_rows(self):
        x = jnp.ones((17, 32), jnp.int8)
        w = jnp.ones((32, 8), jnp.int8)
        got = int8_matmul_dequant(x, w, jnp.ones(8), 1.0)
        np.testing.assert_allclose(np.asarray(got), 32.0)


class TestPacking:
    def test_activation_quant_matches_wage(self):
        """int8 packing must reproduce Q(C(x, b), b) after dequant."""
        x = jnp.asarray(np.random.RandomState(0).randn(128).astype(np.float32))
        vals, scale = quantize_activations_i8(x, 8)
        dequant = vals.astype(jnp.float32) * scale
        want = quan_input(x, 8)  # fwd = Q(C(x, 8), 8)
        np.testing.assert_allclose(np.asarray(dequant), np.asarray(want), atol=1e-7)

    def test_weight_pack_matches_binarize(self):
        w = jnp.asarray(np.random.RandomState(1).randn(1, 1, 32, 8).astype(np.float32))
        sign, cs = pack_binarized_weight(w, bits_g=8)
        dequant = sign.astype(jnp.float32) * cs[None, :]
        want = binarize_weight_value(w, 8)[0, 0]
        np.testing.assert_allclose(np.asarray(dequant), np.asarray(want), atol=1e-7)

    def test_full_binarized_matmul(self):
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(2, 4, 4, 32).astype(np.float32) * 0.5)
        w = jnp.asarray(rs.randn(1, 1, 32, 16).astype(np.float32) * 0.2)
        got = binarized_matmul_infer(x, w, interpret=True)
        # oracle: dequantized WAGE activations @ binarized weights
        xq = quan_input(x, 8).reshape(-1, 32)
        wq = binarize_weight_value(w, 8)[0, 0]
        want = (xq @ wq).reshape(2, 4, 4, 16)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestInt8ModelPath:
    def test_int8_eval_matches_float_simulation_exactly(self, monkeypatch):
        """Model-level int8 inference (VERDICT r1 #7): the pallas int8 MXU
        path and the float simulation of the identical math must agree
        BIT-FOR-BIT (integer products, exact in both arithmetics)."""
        import cunet_tpu.kernels.quant_matmul as qm
        from cunet_tpu.config import ModelConfig, QuantConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net
        from cunet_tpu.train.quant_step import quant_eval_params

        orig = qm.int8_matmul_dequant
        monkeypatch.setattr(qm, "int8_matmul_dequant",
                            lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, class_num=4,
                          neck_size=2, growth_rate=8, init_chan_num=16,
                          num_blocks=2, compute_dtype="float32")
        q_pl = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True,
                           int8_infer=True, int8_impl="pallas")
        q_lx = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True,
                           int8_infer=True, int8_impl="lax")
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
        qp = quant_eval_params(params, q_pl)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_pl, _ = apply_cu_net(qp, state, x, cfg=cfg, train=False, quant=q_pl)
        out_lx, _ = apply_cu_net(qp, state, x, cfg=cfg, train=False, quant=q_lx)
        for a, b in zip(out_pl, out_lx):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_int8_bottleneck_semantics_vs_quan_input_oracle(self):
        """Unit pin: _int8_bottleneck_infer == BN(eval) -> ReLU ->
        quan_input(bits_i) -> 1x1 conv with the binarized weights, exactly
        (the documented semantics of the int8 insertion)."""
        from cunet_tpu.config import QuantConfig
        from cunet_tpu.models.cu_net import _int8_bottleneck_infer
        from cunet_tpu.ops import batch_norm, conv2d, relu

        rs = np.random.RandomState(0)
        cin, cout = 24, 16
        feats = [jnp.asarray(rs.randn(2, 4, 4, 16).astype(np.float32)),
                 jnp.asarray(rs.randn(2, 4, 4, 8).astype(np.float32))]
        p = {
            "norm": {"scale": jnp.asarray(rs.rand(cin).astype(np.float32)),
                     "bias": jnp.asarray(rs.randn(cin).astype(np.float32) * 0.1)},
            "conv": jnp.asarray(
                rs.choice([-1.0, 0.0, 1.0], (1, 1, cin, cout)).astype(np.float32)),
        }
        s = {"mean": jnp.asarray(rs.randn(cin).astype(np.float32) * 0.1),
             "var": jnp.asarray(rs.rand(cin).astype(np.float32) + 0.5)}
        q = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True,
                        int8_infer=True, int8_impl="lax")

        got = _int8_bottleneck_infer(p, s, feats, q)

        x = jnp.concatenate(feats, axis=-1)
        y, _ = batch_norm(x, p["norm"], s, train=False)
        y = quan_input(relu(y), 8)
        want = conv2d(y, p["conv"], stride=1, padding=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_int8_tera_kernel_matches_lax_int8(self, monkeypatch):
        """Whole-model int8 buf kernel == the lax int8_infer path: same
        quantizer insertions, int8 dots exact, intermedia float."""
        import cunet_tpu.kernels.fused_model_buf as fmb
        from cunet_tpu.config import ModelConfig, QuantConfig
        from cunet_tpu.models import apply_cu_net, init_cu_net
        from cunet_tpu.train.quant_step import quant_eval_params

        orig = fmb.fused_model_buf_infer
        monkeypatch.setattr(fmb, "fused_model_buf_infer",
                            lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16,
                     class_num=4, num_blocks=2, compute_dtype="float32")
        cfg_p = ModelConfig(layer_num=4, order=1, loss_num=4, use_pallas=True,
                            pallas_whole_model=True, **SMALL)
        cfg_l = ModelConfig(layer_num=4, order=1, loss_num=4,
                            use_pallas=False, use_scan=False, **SMALL)
        q_pl = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True,
                           int8_infer=True, int8_impl="pallas")
        q_lx = QuantConfig(bits_w=1, bits_i=8, bits_g=8, enabled=True,
                           int8_infer=True, int8_impl="lax")
        params, state = init_cu_net(jax.random.PRNGKey(0), cfg_l)
        qp = quant_eval_params(params, q_pl)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out_p, _ = apply_cu_net(qp, state, x, cfg=cfg_p, train=False, quant=q_pl)
        out_l, _ = apply_cu_net(qp, state, x, cfg=cfg_l, train=False, quant=q_lx)
        assert len(out_p) == len(out_l) == 4
        for a, b in zip(out_p, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_int8_config_validation(self):
        from cunet_tpu.config import QuantConfig

        with pytest.raises(ValueError):
            QuantConfig(bits_w=2, int8_infer=True)
        with pytest.raises(ValueError):
            QuantConfig(bits_w=1, bits_i=16, int8_infer=True)


class TestMultihost:
    def test_initialize_noop_single_process(self):
        from cunet_tpu.parallel.multihost import initialize_multihost

        assert initialize_multihost() is False  # no coordinator env set

    def test_pod_mesh_shape(self):
        from cunet_tpu.parallel.multihost import make_pod_mesh

        mesh = make_pod_mesh(sp=2)
        assert mesh.devices.shape == (len(jax.devices()) // 2, 2)
        assert mesh.axis_names == ("data", "space")

    def test_host_local_batch(self):
        from cunet_tpu.parallel.multihost import (
            host_local_batch_to_global,
            make_pod_mesh,
        )

        mesh = make_pod_mesh(sp=1)
        batch = {
            "image": np.ones((8, 4, 4, 3), np.float32),
            "center": np.zeros((8, 2), np.float32),
        }
        out = host_local_batch_to_global(mesh, batch)
        assert isinstance(out["image"], jax.Array)
        assert out["image"].shape == (8, 4, 4, 3)
        assert isinstance(out["center"], np.ndarray)  # host-local
