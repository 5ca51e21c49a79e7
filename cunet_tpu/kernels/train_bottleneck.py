"""Pallas TRAIN-mode fused dense bottleneck with custom VJP.

The TPU realization of the reference's hand-written autograd Function
(`_EfficientDensenetBottleneckFn`, ref:models/cu_net_prev_version.py:520-599):
concat-free BN(batch stats) -> ReLU -> 1x1 conv whose backward RECOMPUTES the
normalized activations instead of saving them — activation memory is O(1) in
dense-layer count, and the batch statistics used in backward are identical to
the forward's by construction (pure function of the inputs).

Launch plan (vs ~8-10 XLA kernels for the unfused train path):
  forward:  [stats]   per-channel sum/sumsq over all rows     (1 launch)
            [apply]   normalize+ReLU+matmul, row-tiled        (1 launch)
  backward: [reduce]  recompute x_hat/relu; accumulate dW, dscale, dbias,
                      and the two per-channel sums BN backward needs
                      (sum g_y, sum g_y*x_hat)                (1 launch)
            [dx]      recompute again; emit per-row input grads (1 launch)

All reductions ride the sequential TPU grid: accumulator outputs use a
constant index_map and are zero-initialized at program 0.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cunet_tpu.ops.layers import BN_EPS


def _row_tile(m: int, cap: int = 1024) -> int:
    best = 0
    t = 8
    while t <= min(m, cap):
        if m % t == 0:
            best = t
        t += 8
    return best


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _stats_kernel(n_feats, *refs):
    xs = refs[:n_feats]
    out = refs[n_feats]  # (2, Ctot) fp32: [sum; sumsq]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    off = 0
    for k in range(n_feats):
        ck = xs[k].shape[-1]
        x = xs[k][...].astype(jnp.float32)
        out[0, off : off + ck] += jnp.sum(x, axis=0)
        out[1, off : off + ck] += jnp.sum(x * x, axis=0)
        off += ck


def _apply_kernel(n_feats, out_dtype, *refs):
    xs = refs[:n_feats]
    vec = refs[n_feats]          # (2, Ctot): [inv; shift]
    ws = refs[n_feats + 1 : 2 * n_feats + 1]
    out = refs[2 * n_feats + 1]
    acc = refs[2 * n_feats + 2]  # scratch (tm, Cout) fp32

    acc[...] = jnp.zeros_like(acc)
    off = 0
    for k in range(n_feats):
        ck = xs[k].shape[-1]
        x = xs[k][...].astype(jnp.float32)
        y = jnp.maximum(x * vec[0, off : off + ck] + vec[1, off : off + ck], 0.0)
        acc[...] += jax.lax.dot_general(
            y.astype(out_dtype), ws[k][...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off += ck
    out[...] = acc[...].astype(out_dtype)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_reduce_kernel(n_feats, *refs):
    """Per tile: recompute r=relu(x_hat*s+b); g_r = g @ W^T; accumulate
    dW (Ctot, Cout), and per-channel [sum g_y; sum g_y*x_hat] (2, Ctot)."""
    xs = refs[:n_feats]
    g_ref = refs[n_feats]                 # (tm, Cout)
    vec = refs[n_feats + 1]               # (2, Ctot) [inv*scale? no: see below]
    stat = refs[n_feats + 2]              # (3, Ctot) [mean; inv_sigma; scale]
    wt_refs = refs[n_feats + 3 : 2 * n_feats + 3]   # W^T blocks (Cout, ck)
    dw_out = refs[2 * n_feats + 3]        # (Ctot, Cout) accumulator
    sums_out = refs[2 * n_feats + 4]      # (2, Ctot) accumulator

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_out[...] = jnp.zeros_like(dw_out)
        sums_out[...] = jnp.zeros_like(sums_out)

    g = g_ref[...].astype(jnp.float32)
    off = 0
    for k in range(n_feats):
        ck = xs[k].shape[-1]
        x = xs[k][...].astype(jnp.float32)
        mean = stat[0, off : off + ck]
        inv_sigma = stat[1, off : off + ck]
        scale = stat[2, off : off + ck]
        x_hat = (x - mean) * inv_sigma
        y_bn = x_hat * scale + vec[1, off : off + ck]  # vec row1 = bias
        r = jnp.maximum(y_bn, 0.0)
        # dW_k = r^T @ g
        dw_out[off : off + ck, :] += jax.lax.dot_general(
            r, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # g_r = g @ W_k^T ; masked by relu
        g_r = jax.lax.dot_general(
            g, wt_refs[k][...].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_y = jnp.where(y_bn > 0, g_r, 0.0)
        sums_out[0, off : off + ck] += jnp.sum(g_y, axis=0)
        sums_out[1, off : off + ck] += jnp.sum(g_y * x_hat, axis=0)
        off += ck


def _bwd_dx_kernel(n_feats, out_dtypes, *refs):
    """Per tile: dx_k = scale*inv_sigma*(g_y - mean_gy - x_hat*mean_gyxhat)."""
    xs = refs[:n_feats]
    g_ref = refs[n_feats]
    vec = refs[n_feats + 1]               # (2, Ctot) [unused; bias]
    stat = refs[n_feats + 2]              # (3, Ctot)
    red = refs[n_feats + 3]               # (2, Ctot): [mean g_y; mean g_y*x_hat]
    wt_refs = refs[n_feats + 4 : 2 * n_feats + 4]
    dx_refs = refs[2 * n_feats + 4 :]

    g = g_ref[...].astype(jnp.float32)
    off = 0
    for k in range(n_feats):
        ck = xs[k].shape[-1]
        x = xs[k][...].astype(jnp.float32)
        mean = stat[0, off : off + ck]
        inv_sigma = stat[1, off : off + ck]
        scale = stat[2, off : off + ck]
        x_hat = (x - mean) * inv_sigma
        y_bn = x_hat * scale + vec[1, off : off + ck]
        g_r = jax.lax.dot_general(
            g, wt_refs[k][...].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_y = jnp.where(y_bn > 0, g_r, 0.0)
        dx = scale * inv_sigma * (
            g_y - red[0, off : off + ck] - x_hat * red[1, off : off + ck]
        )
        dx_refs[k][...] = dx.astype(out_dtypes[k])
        off += ck


# ---------------------------------------------------------------------------
# host-side wrappers + custom VJP
# ---------------------------------------------------------------------------


def _stats(features_2d, ctot, tm, m, interpret):
    grid = (m // tm,)
    out = pl.pallas_call(
        functools.partial(_stats_kernel, len(features_2d)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, f.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for f in features_2d
        ],
        out_specs=pl.BlockSpec((2, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ctot), jnp.float32),
        interpret=interpret,
    )(*features_2d)
    return out


def _fused_train_bottleneck_fwd_impl(features, scale, bias, w, eps, interpret):
    n, h, wd, _ = features[0].shape
    m = n * h * wd
    dtype = features[0].dtype
    cout = w.shape[3]
    cs = [f.shape[-1] for f in features]
    offs = np.cumsum([0] + cs)
    ctot = int(offs[-1])
    tm = _row_tile(m)
    assert tm > 0, "row count must tile to a multiple of 8"
    feats2d = [f.reshape(m, c) for f, c in zip(features, cs)]

    sums = _stats(feats2d, ctot, tm, m, interpret)
    mean = sums[0] / m
    var = sums[1] / m - mean * mean
    inv_sigma = jax.lax.rsqrt(var + eps)
    inv = inv_sigma * scale
    shift = bias - mean * inv
    vec = jnp.stack([inv, shift])

    wks = [w[0, 0, offs[k] : offs[k + 1], :].astype(dtype) for k in range(len(cs))]
    out = pl.pallas_call(
        functools.partial(_apply_kernel, len(cs), dtype),
        grid=(m // tm,),
        in_specs=(
            [pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
             for c in cs]
            + [pl.BlockSpec((2, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(wk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for wk in wks]
        ),
        out_specs=pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cout), dtype),
        scratch_shapes=[pltpu.VMEM((tm, cout), jnp.float32)],
        interpret=interpret,
    )(*feats2d, vec, *wks)
    return out.reshape(n, h, wd, cout), mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_train_bottleneck(features, scale, bias, w, eps=BN_EPS, interpret=False):
    """Train-mode fused bottleneck. ``features``: tuple of NHWC tensors.

    Returns (out [N,H,W,Cout], batch_mean, batch_var) — the stats feed the
    running-average update outside. Differentiable w.r.t. features, scale,
    bias, w with O(1) saved activations (recompute backward).
    """
    return _fused_train_bottleneck_fwd_impl(tuple(features), scale, bias, w,
                                            eps, interpret)


def _fwd(features, scale, bias, w, eps, interpret):
    out, mean, var = _fused_train_bottleneck_fwd_impl(
        tuple(features), scale, bias, w, eps, interpret
    )
    return (out, mean, var), (tuple(features), scale, bias, w, mean, var)


def _bwd(eps, interpret, residuals, cotangents):
    g_out, g_mean, g_var = cotangents
    del g_mean, g_var  # stats cotangents feed running averages: not diff'd
    features, scale, bias, w, mean, var = residuals
    n, h, wd, _ = features[0].shape
    m = n * h * wd
    dtype = features[0].dtype
    cout = w.shape[3]
    cs = [f.shape[-1] for f in features]
    offs = np.cumsum([0] + cs)
    ctot = int(offs[-1])
    tm = _row_tile(m)
    feats2d = [f.reshape(m, c) for f, c in zip(features, cs)]
    g2d = g_out.reshape(m, cout)

    inv_sigma = jax.lax.rsqrt(var + eps)
    stat = jnp.stack([mean, inv_sigma, scale.astype(jnp.float32)])
    vec = jnp.stack([inv_sigma * scale, bias.astype(jnp.float32)])
    wts = [
        jnp.transpose(w[0, 0, offs[k] : offs[k + 1], :]).astype(jnp.float32)
        for k in range(len(cs))
    ]

    dw2d, sums = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, len(cs)),
        grid=(m // tm,),
        in_specs=(
            [pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
             for c in cs]
            + [pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
               pl.BlockSpec((2, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM),
               pl.BlockSpec((3, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for wt in wts]
        ),
        out_specs=(
            pl.BlockSpec((ctot, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ctot, cout), jnp.float32),
            jax.ShapeDtypeStruct((2, ctot), jnp.float32),
        ),
        interpret=interpret,
    )(*feats2d, g2d, vec, stat, *wts)

    dbias = sums[0]
    # dscale = sum g_y * x_hat
    dscale = sums[1]
    red = sums / m  # [mean g_y; mean g_y*x_hat]

    dxs = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, len(cs),
                          tuple(f.dtype for f in features)),
        grid=(m // tm,),
        in_specs=(
            [pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
             for c in cs]
            + [pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
               pl.BlockSpec((2, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM),
               pl.BlockSpec((3, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM),
               pl.BlockSpec((2, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for wt in wts]
        ),
        out_specs=tuple(
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for c in cs
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, c), f.dtype) for f, c in zip(features, cs)
        ),
        interpret=interpret,
    )(*feats2d, g2d, vec, stat, red, *wts)
    if len(cs) == 1:
        dxs = (dxs,) if not isinstance(dxs, (tuple, list)) else dxs

    dfeatures = tuple(
        dx.reshape(f.shape) for dx, f in zip(dxs, features)
    )
    dw = dw2d.reshape(1, 1, ctot, cout).astype(w.dtype)
    return (dfeatures, dscale.astype(scale.dtype), dbias.astype(bias.dtype), dw)


fused_train_bottleneck.defvjp(_fwd, _bwd)
