"""Naive dense U-Net: one hourglass, dense connectivity only inside blocks.

Functional rebuild of the behavior of ref:models/naive_dense_unet.py — the
baseline the coupled model improves on. Here ``layer_num`` means the number
of dense layers per block (not the number of U-Nets), each block has a single
ahead (and optional skip) adapter over all accumulated features
(ref:models/naive_dense_unet.py:78-138), and the forward is a plain 4-down /
neck / 4-up hourglass with a single head (ref:models/naive_dense_unet.py:245-250).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from cunet_tpu.models.cu_net import _apply_bottleneck, _init_bottleneck
from cunet_tpu.ops import (
    batch_norm,
    conv2d,
    init_bn,
    init_bn_state,
    init_conv,
    max_pool_2x2,
    relu,
    upsample_nearest_2x,
)


@dataclasses.dataclass(frozen=True)
class DenseUNetConfig:
    """ref:naive-dense-unet.py defaults: layer_num dense layers per block."""

    layer_num: int = 4
    neck_size: int = 4
    growth_rate: int = 32
    init_chan_num: int = 128
    class_num: int = 16
    num_blocks: int = 4
    drop_rate: float = 0.0
    compute_dtype: str = "float32"
    remat: str = "bottleneck"
    use_pallas: bool = False
    bn_dtype: str = "float32"   # see ModelConfig.bn_dtype
    bn_tile: int = 0            # see ModelConfig.bn_tile (ghost BN)

    @property
    def bottleneck_chan(self) -> int:
        return self.neck_size * self.growth_rate


def _init_dense_layer(key, cin: int, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    bneck_p, bneck_s = _init_bottleneck(k1, cin, cfg.bottleneck_chan)
    return (
        {
            "bottleneck": bneck_p,
            "norm2": init_bn(k2, cfg.bottleneck_chan),
            "conv2": init_conv(k3, 3, 3, cfg.bottleneck_chan, cfg.growth_rate),
        },
        {"bottleneck": bneck_s, "norm2": init_bn_state(cfg.bottleneck_chan)},
    )


def _init_block(key, cfg, in_num: int, *, requires_skip: bool, is_up: bool):
    """Dense block: layer i input = in_num + i*growth; one adapter over
    in_num + layer_num*growth (ref:models/naive_dense_unet.py:86-104)."""
    layers_p, layers_s = [], []
    for i in range(cfg.layer_num):
        p, s = _init_dense_layer(
            jax.random.fold_in(key, i), in_num + i * cfg.growth_rate, cfg
        )
        layers_p.append(p)
        layers_s.append(s)
    adapter_in = in_num + cfg.layer_num * cfg.growth_rate
    adapter_out = in_num // 2 if is_up else in_num
    ka, ks = jax.random.split(jax.random.fold_in(key, 1000))
    ahead_p, ahead_s = _init_bottleneck(ka, adapter_in, adapter_out)
    params = {"layers": layers_p, "adapter_ahead": ahead_p}
    state = {"layers": layers_s, "adapter_ahead": ahead_s}
    if requires_skip:
        skip_p, skip_s = _init_bottleneck(ks, adapter_in, adapter_out)
        params["adapter_skip"] = skip_p
        state["adapter_skip"] = skip_s
    return params, state


def init_dense_unet(key, cfg: DenseUNetConfig):
    """(params, state) for the single-hourglass dense U-Net."""
    c = cfg.init_chan_num
    keys = jax.random.split(key, 8)
    params: Dict = {
        "stem": {"conv": init_conv(keys[0], 7, 7, 3, c), "norm": init_bn(keys[1], c)}
    }
    state: Dict = {"stem": {"norm": init_bn_state(c)}}
    down_p, down_s, up_p, up_s = [], [], [], []
    for b in range(cfg.num_blocks):
        p, s = _init_block(
            jax.random.fold_in(keys[2], b), cfg, c, requires_skip=True, is_up=False
        )
        down_p.append(p)
        down_s.append(s)
        p, s = _init_block(
            jax.random.fold_in(keys[3], b), cfg, 2 * c, requires_skip=False, is_up=True
        )
        up_p.append(p)
        up_s.append(s)
    neck_p, neck_s = _init_block(keys[4], cfg, c, requires_skip=False, is_up=False)
    params["hg"] = {"down": down_p, "neck": neck_p, "up": up_p}
    state["hg"] = {"down": down_s, "neck": neck_s, "up": up_s}
    head_p, head_s = _init_bottleneck(keys[5], c, cfg.class_num)
    params["head"] = head_p
    state["head"] = head_s
    return params, state


def _apply_dense_layer(params, state, feats, *, cfg, train):
    b, bs = _apply_bottleneck(
        params["bottleneck"], state["bottleneck"], feats, cfg=cfg, train=train
    )
    y, ns2 = batch_norm(b, params["norm2"], state["norm2"], train=train)
    y = conv2d(relu(y), params["conv2"], stride=1, padding=1)
    return y, {"bottleneck": bs, "norm2": ns2}


def _apply_block(params, state, feats: List, *, cfg, train, requires_skip: bool):
    """Accumulate ``layer_num`` dense layers then adapt
    (ref:models/naive_dense_unet.py:115-138)."""
    x = list(feats)
    layers_s = []
    for i in range(cfg.layer_num):
        out, s = _apply_dense_layer(
            params["layers"][i], state["layers"][i], x, cfg=cfg, train=train
        )
        layers_s.append(s)
        x.append(out)
    ahead, ahead_s = _apply_bottleneck(
        params["adapter_ahead"], state["adapter_ahead"], x, cfg=cfg, train=train
    )
    new_state = {"layers": layers_s, "adapter_ahead": ahead_s}
    if requires_skip:
        skip, skip_s = _apply_bottleneck(
            params["adapter_skip"], state["adapter_skip"], x, cfg=cfg, train=train
        )
        new_state["adapter_skip"] = skip_s
        return (ahead, skip), new_state
    return (ahead, None), new_state


def apply_dense_unet(
    params, state, x: jnp.ndarray, *, cfg: DenseUNetConfig, train: bool
) -> Tuple[jnp.ndarray, Dict]:
    """Forward: stem -> hourglass -> head -> [N, 64, 64, class_num]."""
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    new_state = dict(state)
    y = conv2d(x, params["stem"]["conv"], stride=2, padding=3)
    y, stem_ns = batch_norm(y, params["stem"]["norm"], state["stem"]["norm"], train=train)
    y = relu(y)
    y = max_pool_2x2(y)
    new_state["stem"] = {"norm": stem_ns}

    hg_s = {"down": [], "neck": None, "up": [None] * cfg.num_blocks}
    skips = []
    for j in range(cfg.num_blocks):
        (y, skip), s = _apply_block(
            params["hg"]["down"][j], state["hg"]["down"][j], [y],
            cfg=cfg, train=train, requires_skip=True,
        )
        hg_s["down"].append(s)
        skips.append(skip)
        y = max_pool_2x2(y)
    (y, _), hg_s["neck"] = _apply_block(
        params["hg"]["neck"], state["hg"]["neck"], [y],
        cfg=cfg, train=train, requires_skip=False,
    )
    for j in reversed(range(cfg.num_blocks)):
        y = upsample_nearest_2x(y)
        (y, _), hg_s["up"][j] = _apply_block(
            params["hg"]["up"][j], state["hg"]["up"][j], [y, skips[j]],
            cfg=cfg, train=train, requires_skip=False,
        )
    new_state["hg"] = hg_s
    out, head_s = _apply_bottleneck(
        params["head"], state["head"], [y], cfg=cfg, train=train
    )
    new_state["head"] = head_s
    return out, new_state
