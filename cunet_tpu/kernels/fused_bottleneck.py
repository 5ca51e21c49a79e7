"""Pallas TPU kernel: fused concat-free dense bottleneck.

The TPU-native replacement for the reference's shared-storage cuDNN runtime
(ref:models/cu_net_prev_version.py:520-769): BN -> ReLU -> 1x1 conv over the
*virtual* concat of a feature list, in one VMEM-resident pass.

Design (see /opt/skills/guides/pallas_guide.md):

- A 1x1 conv over a channel concat is ``sum_k X_k @ W_k`` with the weight
  split by channel group, so the concat never exists in memory.
- Grid over row tiles of the flattened (N*H*W, C_k) activations; each
  program accumulates all K per-group matmuls into a single fp32 VMEM
  scratch accumulator — partial products never round-trip through HBM
  (XLA's per-group dots would each materialize an (M, C_out) partial).
- The BN affine (precomputed per-channel scale/shift) and ReLU ride the
  VPU as a prologue fused in front of each MXU call.
- bf16 inputs hit the MXU with fp32 accumulation
  (``preferred_element_type``).

This kernel serves the inference path (eval-mode BN folds into scale/shift).
The training path keeps the lax formulation under ``jax.checkpoint``
(cunet_tpu.ops.bottleneck), which already avoids the concat and recomputes
the BN/ReLU intermediates in backward.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(m: int, cap: int = 512) -> int:
    """Largest multiple-of-8 divisor of m, at most cap; 0 if none."""
    best = 0
    t = 8
    while t <= min(m, cap):
        if m % t == 0:
            best = t
        t += 8
    return best


def _kernel(n_feats, out_dtype, *refs):
    """refs layout: x_0..x_{K-1}, inv (1, Ctot), shift (1, Ctot),
    w_0..w_{K-1}, out_ref, acc_scratch."""
    xs = refs[:n_feats]
    inv_ref = refs[n_feats]
    shift_ref = refs[n_feats + 1]
    ws = refs[n_feats + 2 : 2 * n_feats + 2]
    out_ref = refs[2 * n_feats + 2]
    acc = refs[2 * n_feats + 3]

    acc[...] = jnp.zeros_like(acc)
    off = 0
    for k in range(n_feats):
        ck = xs[k].shape[-1]
        x = xs[k][...].astype(jnp.float32)
        y = x * inv_ref[0, off : off + ck] + shift_ref[0, off : off + ck]
        y = jnp.maximum(y, 0.0).astype(xs[k].dtype)
        acc[...] += jax.lax.dot_general(
            y,
            ws[k][...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off += ck
    out_ref[...] = acc[...].astype(out_dtype)


def fused_bottleneck_infer(
    features: Sequence[jnp.ndarray],
    inv: jnp.ndarray,
    shift: jnp.ndarray,
    w: jnp.ndarray,
    *,
    interpret: bool = False,
):
    """Eval-mode fused bottleneck.

    Args:
      features: list of NHWC tensors (same N, H, W).
      inv/shift: per-channel folded BN (Ctot,) fp32
        (see ops.layers.bn_inference_scale_shift).
      w: (1, 1, Ctot, Cout) conv kernel.
    Returns (N, H, W, Cout) in the features' dtype.

    Falls back to the pure-lax formulation when the row count doesn't tile.
    """
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    n, h, wd, _ = features[0].shape
    m = n * h * wd
    cout = w.shape[3]
    dtype = features[0].dtype
    tm = _row_tile(m)
    if tm == 0:
        return _lax_fallback(features, inv, shift, w)

    n_feats = len(features)
    xs2d = [f.reshape(m, f.shape[-1]) for f in features]
    offs = np.cumsum([0] + [f.shape[-1] for f in features])
    w2d = [
        w[0, 0, offs[k] : offs[k + 1], :].astype(dtype) for k in range(n_feats)
    ]
    inv2d = inv.reshape(1, -1).astype(jnp.float32)
    shift2d = shift.reshape(1, -1).astype(jnp.float32)

    grid = (m // tm,)
    in_specs = (
        [
            pl.BlockSpec((tm, x.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for x in xs2d
        ]
        + [
            pl.BlockSpec((1, inv2d.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, shift2d.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(wk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for wk in w2d
        ]
    )
    flops = 2 * m * sum(x.shape[-1] for x in xs2d) * cout
    out = pl.pallas_call(
        functools.partial(_kernel, n_feats, dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cout), dtype),
        scratch_shapes=[pltpu.VMEM((tm, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(x.size * x.dtype.itemsize for x in xs2d)
            + m * cout * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*xs2d, inv2d, shift2d, *w2d)
    return out.reshape(n, h, wd, cout)


def _dual_kernel(n_feats, out_dtype, *refs):
    """refs: x_0..x_{K-1}, inv_a, shift_a, inv_s, shift_s (each (1, Ctot)),
    wa_0..wa_{K-1}, ws_0..ws_{K-1}, out_a, out_s, acc_a, acc_s."""
    xs = refs[:n_feats]
    inv_a, shift_a, inv_s, shift_s = refs[n_feats : n_feats + 4]
    was = refs[n_feats + 4 : 2 * n_feats + 4]
    wss = refs[2 * n_feats + 4 : 3 * n_feats + 4]
    out_a, out_s, acc_a, acc_s = refs[3 * n_feats + 4 :]

    acc_a[...] = jnp.zeros_like(acc_a)
    acc_s[...] = jnp.zeros_like(acc_s)
    off = 0
    for k in range(n_feats):
        ck = xs[k].shape[-1]
        x = xs[k][...].astype(jnp.float32)  # read ONCE, feed both adapters
        ya = jnp.maximum(x * inv_a[0, off : off + ck] + shift_a[0, off : off + ck], 0.0)
        ys = jnp.maximum(x * inv_s[0, off : off + ck] + shift_s[0, off : off + ck], 0.0)
        dn = (((1,), (0,)), ((), ()))
        acc_a[...] += jax.lax.dot_general(
            ya.astype(xs[k].dtype), was[k][...], dn, preferred_element_type=jnp.float32
        )
        acc_s[...] += jax.lax.dot_general(
            ys.astype(xs[k].dtype), wss[k][...], dn, preferred_element_type=jnp.float32
        )
        off += ck
    out_a[...] = acc_a[...].astype(out_dtype)
    out_s[...] = acc_s[...].astype(out_dtype)


def fused_dual_bottleneck_infer(
    features: Sequence[jnp.ndarray],
    inv_a, shift_a, w_a,
    inv_s, shift_s, w_s,
    *,
    interpret: bool = False,
):
    """Two eval-mode bottlenecks over the SAME feature list in one kernel:
    the ahead + skip adapter pair of a down block (ref:models/cu_net.py:139-142)
    shares every input read and launches once — on a launch-overhead-bound
    chip this halves the adapter cost outright.
    """
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    n, h, wd, _ = features[0].shape
    m = n * h * wd
    cout = w_a.shape[3]
    dtype = features[0].dtype
    tm = _row_tile(m)
    if tm == 0:
        a = _lax_fallback(features, inv_a, shift_a, w_a)
        s = _lax_fallback(features, inv_s, shift_s, w_s)
        return a, s

    n_feats = len(features)
    xs2d = [f.reshape(m, f.shape[-1]) for f in features]
    offs = np.cumsum([0] + [f.shape[-1] for f in features])
    wa2d = [w_a[0, 0, offs[k] : offs[k + 1], :].astype(dtype) for k in range(n_feats)]
    ws2d = [w_s[0, 0, offs[k] : offs[k + 1], :].astype(dtype) for k in range(n_feats)]
    ctot = int(offs[-1])
    vecs = [
        inv_a.reshape(1, ctot).astype(jnp.float32),
        shift_a.reshape(1, ctot).astype(jnp.float32),
        inv_s.reshape(1, ctot).astype(jnp.float32),
        shift_s.reshape(1, ctot).astype(jnp.float32),
    ]

    in_specs = (
        [pl.BlockSpec((tm, x.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
         for x in xs2d]
        + [pl.BlockSpec((1, ctot), lambda i: (0, 0), memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wa2d + ws2d]
    )
    out_a, out_s = pl.pallas_call(
        functools.partial(_dual_kernel, n_feats, dtype),
        grid=(m // tm,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, cout), dtype),
            jax.ShapeDtypeStruct((m, cout), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, cout), jnp.float32),
            pltpu.VMEM((tm, cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * ctot * cout,
            bytes_accessed=sum(x.size * x.dtype.itemsize for x in xs2d)
            + 2 * m * cout * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*xs2d, *vecs, *wa2d, *ws2d)
    return out_a.reshape(n, h, wd, cout), out_s.reshape(n, h, wd, cout)


def _lax_fallback(features, inv, shift, w):
    n, h, wd, _ = features[0].shape
    cout = w.shape[3]
    dtype = features[0].dtype
    acc = jnp.zeros((n * h * wd, cout), jnp.float32)
    off = 0
    for f in features:
        c = f.shape[-1]
        y = f.astype(jnp.float32) * inv[off : off + c] + shift[off : off + c]
        y = jnp.maximum(y, 0).astype(dtype)
        acc = acc + jax.lax.dot_general(
            y.reshape(-1, c),
            w[0, 0, off : off + c, :].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off += c
    return acc.reshape(n, h, wd, cout).astype(dtype)
