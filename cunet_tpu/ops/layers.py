"""Core functional NN ops: conv, batch-norm, pooling, upsampling.

Layout is NHWC (TPU-native; the reference is NCHW torch). Parameters are
plain pytrees; batch-norm running statistics live in a separate ``state``
pytree so every function is pure: ``y, new_state = f(params, state, x)``.

Numerics match ``torch.nn`` semantics used by the reference
(ref:models/cu_net.py:22-25,41-48): BN eps=1e-5, momentum=0.1 (running stats
use unbiased variance, normalization uses biased), convs bias-free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

# ---------------------------------------------------------------------------
# initializers (match ref:models/cu_net.py:322-334)
# ---------------------------------------------------------------------------


def init_conv(key, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """Conv weight, HWIO layout; U(-1/sqrt(kh*kw*cin), +1/sqrt(kh*kw*cin)).

    Matches the fan-in uniform init of ref:models/cu_net.py:323-326.
    """
    stdv = 1.0 / (kh * kw * cin) ** 0.5
    return jax.random.uniform(
        key, (kh, kw, cin, cout), dtype=dtype, minval=-stdv, maxval=stdv
    )


def init_bn(key, c: int, dtype=jnp.float32):
    """BN params: scale ~ U(0,1), bias = 0 (ref:models/cu_net.py:331-334)."""
    return {
        "scale": jax.random.uniform(key, (c,), dtype=dtype),
        "bias": jnp.zeros((c,), dtype=dtype),
    }


def init_bn_state(c: int, dtype=jnp.float32):
    """Running statistics, torch defaults: mean 0, var 1."""
    return {"mean": jnp.zeros((c,), dtype=dtype), "var": jnp.ones((c,), dtype=dtype)}


# ---------------------------------------------------------------------------
# batch norm
# ---------------------------------------------------------------------------


def batch_norm(
    x, params, state, *, train: bool, eps: float = BN_EPS,
    momentum: float = BN_MOMENTUM, norm_dtype=None, tile: int = 0,
) -> Tuple[jnp.ndarray, dict]:
    """Functional BatchNorm over NHWC (stats over N,H,W).

    Train mode normalizes with biased batch stats and updates running stats
    with the unbiased variance (torch.nn.BatchNorm2d semantics, which the
    reference relies on for its recompute-with-frozen-stats backward,
    ref:models/cu_net_prev_version.py:567-571 — in functional JAX the
    recompute trivially reproduces the same stats).

    Statistics are always computed in fp32. ``norm_dtype`` controls the
    normalize/affine arithmetic: None = fp32 (torch parity); a narrower dtype
    (the model's compute dtype) is flax-style mixed precision that halves the
    elementwise HBM traffic of the train step's hottest fusions, forward and
    backward (cfg.bn_dtype="compute").

    ``tile`` > 0 enables ghost/per-replica BN: batch statistics are computed
    per contiguous group of ``tile`` images, matching how the reference's
    DataParallel NORMALIZES (per GPU shard, ref:cu-net.py:59). Running stats
    update with the tile-averaged statistics (mean of per-tile means == the
    global mean; variance is the average of per-tile unbiased variances) —
    a deliberate difference from torch DataParallel, which persists replica
    0's running buffers only; checkpointed running-stat trajectories
    therefore differ slightly from the reference's.
    """
    scale = params["scale"]
    bias = params["bias"]
    n, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    if train and tile and tile < n:
        assert n % tile == 0, f"batch {n} not divisible by bn_tile {tile}"
        t = n // tile
        xt = x32.reshape(t, tile * h * w, c)
        mean = jnp.mean(xt, axis=1)                      # (t, c)
        var = jnp.var(xt, axis=1)                        # (t, c)
        cnt = tile * h * w
        unbiased = var * (cnt / max(cnt - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * jnp.mean(mean, 0),
            "var": (1 - momentum) * state["var"] + momentum * jnp.mean(unbiased, 0),
        }
        inv = lax.rsqrt(var + eps) * scale               # (t, c)
        shift = bias - mean * inv                        # (t, c)
        nd = jnp.float32
        if norm_dtype is not None and jnp.dtype(norm_dtype) != jnp.float32:
            nd = jnp.dtype(norm_dtype)
            inv, shift = inv.astype(nd), shift.astype(nd)
        y = x.astype(nd).reshape(t, tile * h * w, c) * inv[:, None, :] \
            + shift[:, None, :]
        return y.reshape(n, h, w, c).astype(x.dtype), new_state
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        cnt = n * h * w
        unbiased = var * (cnt / max(cnt - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = lax.rsqrt(var + eps) * scale
    if norm_dtype is not None and jnp.dtype(norm_dtype) != jnp.float32:
        nd = jnp.dtype(norm_dtype)
        shift = (bias - mean * inv).astype(nd)
        y = x.astype(nd) * inv.astype(nd) + shift
    else:
        y = (x32 - mean) * inv + bias
    return y.astype(x.dtype), new_state


def bn_inference_scale_shift(params, state, *, eps: float = BN_EPS):
    """Fold eval-mode BN into per-channel (scale, shift) for fused kernels."""
    inv = lax.rsqrt(state["var"] + eps) * params["scale"]
    return inv, params["bias"] - state["mean"] * inv


# ---------------------------------------------------------------------------
# conv / pool / upsample
# ---------------------------------------------------------------------------

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, *, stride: int = 1, padding: int = 0):
    """2D convolution, NHWC/HWIO.

    No ``preferred_element_type``: the TPU MXU accumulates bf16 convs in
    fp32 internally anyway, and a f32-preferred output breaks the conv
    transpose (backward) under bf16 in this JAX version (mixed-dtype
    conv_general in the cotangent).
    """
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMS,
    )


def conv3x3_scatter(x, w):
    """3x3 same-padding conv as ONE fat matmul + 9 shifted adds.

    The model's 3x3 convs emit only ``growth_rate`` (32) channels — an
    MXU-hostile N dimension (the 128-wide systolic array runs at ~25%
    occupancy). Reformulated: ``t = x @ W'`` with ``W' (Cin, 9*Cout)``
    (tap-major columns) fills the lanes, then each output gathers its 9
    spatially-shifted tap slices (cheap VPU adds XLA fuses). Numerically
    identical to ``conv2d(x, w, padding=1)``; autodiff produces equally
    well-shaped matmuls for dX and dW, which is what makes the TRAIN path
    fast without custom kernels.
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    w_sc = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, 9 * cout)
    t = lax.dot_general(
        x.reshape(n * h * wd, cin), w_sc.astype(x.dtype),
        (((1,), (0,)), ((), ())),
    )
    tp = jnp.pad(t.reshape(n, h, wd, 9 * cout), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            d = dy * 3 + dx
            sl = tp[:, dy:dy + h, dx:dx + wd, d * cout:(d + 1) * cout]
            acc = sl if acc is None else acc + sl
    return acc


def max_pool_2x2(x):
    """2x2/stride-2 max pool (ref:models/cu_net.py:249,303).

    Init must be -inf (not finfo.min): XLA only recognizes the reduce-window
    as a differentiable max-pool with the identity element, and bf16 training
    on TPU fails to linearize otherwise.
    """
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample (ref:models/cu_net.py:250,265).

    Implemented as broadcast+reshape, which XLA lowers to a cheap layout op.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def relu(x):
    return jnp.maximum(x, 0)
