"""Concat-free dense bottleneck: BN(concat(features)) -> ReLU -> 1x1 conv.

This is the hottest op of the coupled U-Net (ref:models/cu_net.py:11-17, the
``bn_function`` closed over by every dense layer and adapter). The reference
materializes the channel concat and, for memory, either recomputes it in
backward via ``torch.utils.checkpoint`` (ref:models/cu_net.py:58-61) or
hand-rolls shared-storage recompute against cuDNN
(ref:models/cu_net_prev_version.py:520-599).

TPU-native formulation: a 1x1 conv over a channel concat is a sum of
per-group matmuls — ``out = sum_k relu(bn_k(x_k)) @ W_k`` — because BN is
per-channel and the channel groups are disjoint. So the concat never needs to
exist: XLA keeps each partial product in registers/VMEM and the Pallas kernel
(cunet_tpu.kernels.fused_bottleneck) accumulates entirely in VMEM. Activation
memory stays O(1) in dense-layer count when combined with ``jax.checkpoint``
(the functional equivalent of both reference recompute mechanisms: a pure
function recomputes identical batch statistics by construction).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cunet_tpu.ops.layers import BN_EPS, BN_MOMENTUM


def _group_slices(features: Sequence[jnp.ndarray]):
    offs, off = [], 0
    for f in features:
        c = f.shape[-1]
        offs.append((off, c))
        off += c
    return offs, off


def dense_bottleneck(
    features: Sequence[jnp.ndarray],
    params: dict,
    state: dict,
    *,
    train: bool,
    eps: float = BN_EPS,
    momentum: float = BN_MOMENTUM,
    norm_dtype=None,
    tile: int = 0,
) -> Tuple[jnp.ndarray, dict]:
    """BN -> ReLU -> 1x1 conv over the *virtual* concat of ``features``.

    Args:
      features: list of NHWC tensors sharing N,H,W; channel counts may differ.
      params: ``{'norm': {'scale','bias'} over total channels, 'conv': [1,1,Ctot,Cout]}``.
      state: ``{'mean','var'}`` over total channels.
      train: batch statistics + running-stat update vs. running statistics.
      norm_dtype: None = normalize in fp32 (torch parity); a narrower dtype
        does the affine in that dtype (stats stay fp32) — see
        ops.layers.batch_norm.

    Returns ``(out [N,H,W,Cout], new_state)``.
    """
    offs, ctot = _group_slices(features)
    w = params["conv"]
    assert w.shape[2] == ctot, f"conv in-channels {w.shape[2]} != concat {ctot}"
    scale, bias = params["norm"]["scale"], params["norm"]["bias"]
    mean_r, var_r = state["mean"], state["var"]

    n, h, wd, _ = features[0].shape
    cout = w.shape[3]
    out_dtype = features[0].dtype

    ghost = bool(train and tile and tile < n)
    t = n // tile if ghost else 1
    if ghost:
        assert n % tile == 0, f"batch {n} not divisible by bn_tile {tile}"
    stat_axes = (1,) if ghost else (0, 1, 2)

    if train:
        # Per-group batch stats == concat batch stats (disjoint channels).
        means, variances = [], []
        for f in features:
            f32 = f.astype(jnp.float32)
            if ghost:
                f32 = f32.reshape(t, tile * h * wd, f.shape[-1])
            means.append(jnp.mean(f32, axis=stat_axes))
            variances.append(jnp.var(f32, axis=stat_axes))
        mean = jnp.concatenate(means, axis=-1)    # (c,) or (t, c)
        var = jnp.concatenate(variances, axis=-1)
        cnt = (tile if ghost else n) * h * wd
        unbiased = var * (cnt / max(cnt - 1, 1))
        mean_u = jnp.mean(mean, 0) if ghost else mean
        var_u = jnp.mean(unbiased, 0) if ghost else unbiased
        new_state = {
            "mean": (1 - momentum) * mean_r + momentum * mean_u,
            "var": (1 - momentum) * var_r + momentum * var_u,
        }
    else:
        mean, var = mean_r, var_r
        new_state = state

    inv = lax.rsqrt(var + eps) * scale
    shift = bias - mean * inv
    nd = jnp.float32
    if norm_dtype is not None and jnp.dtype(norm_dtype) != jnp.float32:
        nd = jnp.dtype(norm_dtype)
        inv, shift = inv.astype(nd), shift.astype(nd)

    acc = jnp.zeros((n, h, wd, cout), dtype=jnp.float32)
    for f, (off, c) in zip(features, offs):
        inv_k = inv[..., off : off + c]
        shift_k = shift[..., off : off + c]
        if ghost and train:
            y = f.astype(nd).reshape(t, tile * h * wd, c) * inv_k[:, None, :] \
                + shift_k[:, None, :]
        else:
            y = f.astype(nd) * inv_k + shift_k
        y = jnp.maximum(y, 0).astype(out_dtype)
        wk = w[0, 0, off : off + c, :].astype(out_dtype)
        acc = acc + lax.dot_general(
            y.reshape(n * h * wd, c),
            wk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n, h, wd, cout)
    return acc.astype(out_dtype), new_state


def dense_bottleneck_infer_pallas(features, params, state, *, interpret=False):
    """Eval-mode dispatch to the fused Pallas kernel: fold running-stat BN
    into per-channel scale/shift, then one VMEM-resident fused pass."""
    from cunet_tpu.kernels.fused_bottleneck import fused_bottleneck_infer
    from cunet_tpu.ops.layers import bn_inference_scale_shift

    inv, shift = bn_inference_scale_shift(params["norm"], state)
    out = fused_bottleneck_infer(
        list(features), inv, shift, params["conv"], interpret=interpret
    )
    return out, state


def dense_bottleneck_train_pallas(
    features, params, state, *, eps: float = BN_EPS, momentum: float = BN_MOMENTUM
):
    """Train-mode dispatch to the fused Pallas kernel with custom VJP
    (cunet_tpu.kernels.train_bottleneck): O(1) saved activations, recompute
    backward — the kernel-level realization of the reference's
    _EfficientDensenetBottleneckFn. Returns (out, new_running_state)."""
    from cunet_tpu.kernels.train_bottleneck import _row_tile, fused_train_bottleneck

    n, h, wd, _ = features[0].shape
    if _row_tile(n * h * wd) == 0:
        return dense_bottleneck(features, params, state, train=True,
                                eps=eps, momentum=momentum)
    out, mean, var = fused_train_bottleneck(
        tuple(features), params["norm"]["scale"], params["norm"]["bias"],
        params["conv"], eps,
    )
    cnt = n * h * wd
    unbiased = var * (cnt / max(cnt - 1, 1))
    new_state = {
        "mean": (1 - momentum) * state["mean"] + momentum * mean,
        "var": (1 - momentum) * state["var"] + momentum * unbiased,
    }
    return out, new_state


def dense_bottleneck_remat(features, params, state, *, train, **kw):
    """``dense_bottleneck`` under ``jax.checkpoint``: nothing between the
    inputs and the 1x1-conv output is saved for backward — the BN/ReLU
    intermediates are recomputed, exactly the capability of
    ref:models/cu_net_prev_version.py:520-599 but derived automatically."""
    fn = jax.checkpoint(
        lambda feats, p, s: dense_bottleneck(feats, p, s, train=train, **kw)
    )
    return fn(list(features), params, state)
