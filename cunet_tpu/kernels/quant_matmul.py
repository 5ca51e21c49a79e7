"""Pallas low-bit matmul kernels for the quantized inference path.

The reference's quantized models still run fp32 GEMMs on dequantized values
(binarization is simulated, ref:utils/quantize.py:127-149). On TPU the MXU
multiplies int8 natively at 2x bf16 throughput, so real low-bit inference is
a capability upgrade the reference only simulates:

- binarized weights are ``sign(w) * m`` with one fp scale per output filter
  -> store ``sign`` as int8 and fold ``m`` into a per-column epilogue scale;
- WAGE activations are fixed-point ``round(x * 2^(b-1)) / 2^(b-1)``
  -> store the integer part as int8 with a single static scale.

``int8_matmul_dequant`` computes ``(x_i8 @ w_i8) * col_scale * x_scale`` with
int32 accumulation on the MXU and an fp32 VPU epilogue, tiled over rows.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cunet_tpu.quant.wage import scale_s


def _row_tile_i8(m: int, cap: int = 1024) -> int:
    best = 0
    t = 32  # int8 min sublane tile
    while t <= min(m, cap):
        if m % t == 0:
            best = t
        t += 32
    return best


def _kernel(x_scale, out_dtype, x_ref, w_ref, col_scale_ref, out_ref):
    acc = jax.lax.dot_general(
        x_ref[...],
        w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * col_scale_ref[0, :] * x_scale
    out_ref[...] = out.astype(out_dtype)


def int8_matmul_dequant(
    x_i8: jnp.ndarray,
    w_i8: jnp.ndarray,
    col_scale: jnp.ndarray,
    x_scale: float,
    *,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """(M, K) int8 @ (K, N) int8 -> (M, N) float, scaled per column.

    Falls back to a lax formulation when M doesn't tile to int8 sublanes.
    """
    m, k = x_i8.shape
    n = w_i8.shape[1]
    tm = _row_tile_i8(m)
    if tm == 0:
        acc = jax.lax.dot_general(
            x_i8, w_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * col_scale * x_scale).astype(out_dtype)

    return pl.pallas_call(
        functools.partial(_kernel, float(x_scale), out_dtype),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k * n + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_i8, w_i8, col_scale.reshape(1, n).astype(jnp.float32))


def pack_binarized_weight(w: jnp.ndarray, bits_g: int = 8):
    """HWIO 1x1 conv weight -> (sign int8 [K, N], per-column scale [N]).

    Matches the binarization semantics of ref:utils/quantize.py:127-134:
    scale = per-output-filter mean |w|, itself quantized to bits_g.
    """
    from cunet_tpu.quant.wage import _per_filter_mean_abs, quant_q

    assert w.shape[0] == 1 and w.shape[1] == 1, "pack expects a 1x1 conv"
    w2 = w[0, 0]  # (K, N)
    m = quant_q(_per_filter_mean_abs(w), bits_g)[0, 0, 0, :]  # (N,)
    return jnp.sign(w2).astype(jnp.int8), m.astype(jnp.float32)


def quantize_activations_i8(x: jnp.ndarray, bits_i: int = 8):
    """WAGE fixed-point activations -> (int8 values, static scale).

    ``Q(C(x, b), b) = round(clip(x) * S) / S`` with ``S = 2^(b-1)``
    (ref:utils/quantize.py:33-42); int8 holds ``round(clip(x) * S)`` for
    b <= 8, and the dequant scale is ``1/S``.
    """
    assert 2 < bits_i <= 8, "int8 packing supports 3..8 activation bits"
    s = scale_s(bits_i)
    delta = 1.0 / s
    clipped = jnp.clip(x, -1 + delta, 1 - delta)
    vals = jnp.sign(clipped) * jnp.floor(jnp.abs(clipped) * s + 0.5)
    return vals.astype(jnp.int8), 1.0 / s


def binarized_matmul_infer(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    bits_i: int = 8,
    bits_g: int = 8,
    interpret: bool = False,
):
    """Full low-bit path: quantize activations to int8, binarized 1x1 conv
    weight to sign+scale, int8 MXU matmul, fp epilogue.

    x: (..., K) float; w: (1, 1, K, N). Returns (..., N) float32.
    """
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    lead = x.shape[:-1]
    k = x.shape[-1]
    x_i8, x_scale = quantize_activations_i8(x.reshape(-1, k), bits_i)
    w_i8, col_scale = pack_binarized_weight(w, bits_g)
    out = int8_matmul_dequant(
        x_i8, w_i8, col_scale, x_scale, interpret=interpret
    )
    return out.reshape(*lead, w.shape[3])
