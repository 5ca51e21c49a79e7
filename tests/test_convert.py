"""Torch-checkpoint converter tests: name coverage, layout transpose, both
reference naming schemes, DataParallel prefix, merge semantics."""

import jax
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig
from cunet_tpu.models import apply_cu_net, init_cu_net
from cunet_tpu.tools.convert_torch import (
    _NameMap,
    convert_state_dict,
    merge_into,
)

SMALL = dict(neck_size=2, growth_rate=8, init_chan_num=16, class_num=4, num_blocks=2)
CFG = ModelConfig(layer_num=2, order=1, loss_num=2, **SMALL)


def _torch_sd_for(cfg, scheme="current", prefix=""):
    """Synthesize a state dict with reference-style names and correctly
    shaped random values, derived from our init tree shapes."""
    params, state = init_cu_net(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    sd = {}

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    for path, stem, kind in _NameMap(cfg).entries:
        if kind == "conv":
            w = np.asarray(get(params, path))  # HWIO
            oihw = rs.randn(w.shape[3], w.shape[2], w.shape[0], w.shape[1]).astype(
                np.float32
            )
            if scheme == "prev" and stem.endswith(".conv1"):
                name = stem[: -len(".conv1")] + ".bottleneck.conv_weight"
            elif scheme == "prev" and stem.endswith(".adapter_conv"):
                name = stem[: -len(".adapter_conv")] + ".conv_weight"
            else:
                name = f"{stem}.weight"
            sd[prefix + name] = oihw
        else:
            c = np.asarray(get(params, path)["scale"]).shape[0]
            if scheme == "prev" and stem.endswith(".norm1"):
                base = stem[: -len(".norm1")] + ".bottleneck"
                names = {
                    "weight": f"{base}.norm_weight",
                    "bias": f"{base}.norm_bias",
                    "running_mean": f"{base}.norm_running_mean",
                    "running_var": f"{base}.norm_running_var",
                }
            elif scheme == "prev" and stem.endswith(".adapter_norm"):
                base = stem[: -len(".adapter_norm")]
                names = {
                    "weight": f"{base}.norm_weight",
                    "bias": f"{base}.norm_bias",
                    "running_mean": f"{base}.norm_running_mean",
                    "running_var": f"{base}.norm_running_var",
                }
            else:
                names = {f: f"{stem}.{f}" for f in
                         ["weight", "bias", "running_mean", "running_var"]}
            sd[prefix + names["weight"]] = rs.rand(c).astype(np.float32)
            sd[prefix + names["bias"]] = rs.randn(c).astype(np.float32) * 0.1
            sd[prefix + names["running_mean"]] = rs.randn(c).astype(np.float32) * 0.1
            sd[prefix + names["running_var"]] = rs.rand(c).astype(np.float32) + 0.5
    return sd


class TestConverter:
    @pytest.mark.parametrize("scheme", ["current", "prev"])
    @pytest.mark.parametrize("prefix", ["", "module."])
    def test_full_coverage_and_structure(self, scheme, prefix):
        sd = _torch_sd_for(CFG, scheme=scheme, prefix=prefix)
        params, state, missing = convert_state_dict(sd, CFG)
        assert missing == []
        # merged onto init tree -> identical structure
        ip, istate = init_cu_net(jax.random.PRNGKey(0), CFG)
        merged_p = merge_into(ip, params)
        merged_s = merge_into(istate, state)
        assert jax.tree_util.tree_structure(merged_p) == jax.tree_util.tree_structure(ip)
        assert jax.tree_util.tree_structure(merged_s) == jax.tree_util.tree_structure(istate)
        # every leaf replaced (init used PRNGKey(0); sd used independent rand)
        same = [
            np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(merged_p),
                            jax.tree_util.tree_leaves(ip))
        ]
        # bias leaves init to 0 vs random -> none should be identical except
        # by coincidence; assert the vast majority replaced
        assert sum(same) < len(same) * 0.1

    def test_conv_layout_transposed(self):
        sd = _torch_sd_for(CFG)
        params, _, _ = convert_state_dict(sd, CFG)
        stem_t = sd["features.conv0.weight"]  # OIHW (16, 3, 7, 7)
        got = params["stem"]["conv"]          # HWIO (7, 7, 3, 16)
        assert got.shape == (7, 7, 3, 16)
        np.testing.assert_allclose(got[3, 2, 1, 5], stem_t[5, 1, 3, 2])

    def test_converted_model_runs(self):
        sd = _torch_sd_for(CFG)
        params, state, _ = convert_state_dict(sd, CFG)
        ip, istate = init_cu_net(jax.random.PRNGKey(0), CFG)
        p = merge_into(ip, params)
        s = merge_into(istate, state)
        outs, _ = apply_cu_net(
            p, s, np.ones((1, 32, 32, 3), np.float32), cfg=CFG, train=False
        )
        assert outs[-1].shape == (1, 8, 8, 4)
        assert np.isfinite(np.asarray(outs[-1])).all()

    def test_missing_reported(self):
        sd = _torch_sd_for(CFG)
        del sd["features.conv0.weight"]
        params, _, missing = convert_state_dict(sd, CFG)
        assert "features.conv0" in missing
        with pytest.raises(KeyError):
            convert_state_dict(sd, CFG, strict=True)
