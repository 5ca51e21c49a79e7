"""WAGE-style quantization primitives + straight-through estimators.

Behavioral rebuild of ref:utils/quantize.py (and the torch-0.1.12 twin
ref:utils/quantize_prev_version.py — one implementation here, not three).
Bit-widths are explicit arguments; the reference's import-time argparse
globals (ref:utils/quantize.py:8-11) are deliberately not reproduced
(SURVEY.md §2.2 "config coupling wart").

The reference mutates weights in place around each step
(quantization() / restore() / updateQuanGradWeight(),
ref:utils/quantize.py:104-175). Functionally that whole protocol is a
*fake-quantization custom_vjp*: forward emits the quantized weights, backward
applies the XNOR-Net jacobian (bits_w==1) or the straight-through estimator
and then quantizes the gradient to bits_g — so ``jax.grad`` of a loss through
``fake_quant_weight`` reproduces the reference's hand-corrected gradients and
the optimizer simply steps on the fp master weights.

Weight layout is HWIO (torch is OIHW): per-filter reductions are over axes
(0, 1, 2); the input-channel axis is 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def scale_s(bits: int) -> float:
    """S(bits) = 2^(bits-1) (ref:utils/quantize.py:15-16)."""
    return 2.0 ** (bits - 1)


def clip_c(x, bits: int = 32):
    """Clamp to [-1+delta, 1-delta]; delta=0 for bits>15 or bits in {1,2}
    (ref:utils/quantize.py:20-28)."""
    delta = 0.0 if (bits > 15 or bits in (1, 2)) else 1.0 / scale_s(bits)
    return jnp.clip(x, -1 + delta, 1 - delta)


def quant_q(x, bits: int):
    """Q(x, bits): identity (>15) / sign (1) / round (2) / fixed-point
    (ref:utils/quantize.py:33-42). ``round`` uses round-half-away-from-zero
    to match torch.round on the reference's torch versions."""
    if bits > 15:
        return x
    if bits == 1:
        return jnp.sign(x)
    if bits == 2:
        return _round_half_away(x)
    s = scale_s(bits)
    return _round_half_away(x * s) / s


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


# ---------------------------------------------------------------------------
# activation quantizer (QuanInput STE)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def quan_input(x, bits_i: int):
    """Quantize activations: Q(C(x, bits_i), bits_i); backward passes the
    gradient through except where |x| >= 1 (ref:utils/quantize.py:47-63)."""
    return quant_q(clip_c(x, bits_i), bits_i)


def _quan_input_fwd(x, bits_i):
    return quan_input(x, bits_i), x


def _quan_input_bwd(bits_i, x, g):
    mask = (x < 1) & (x > -1)  # zero where x >= 1 or x <= -1
    return (jnp.where(mask, g, 0.0),)


quan_input.defvjp(_quan_input_fwd, _quan_input_bwd)


# ---------------------------------------------------------------------------
# weight quantizers (fake-quant with reference-parity backward)
# ---------------------------------------------------------------------------

_FILTER_AXES = (0, 1, 2)  # HWIO: reduce over H, W, I -> per-output-filter


def _per_filter_mean_abs(w):
    """L1 norm per output filter / per-filter element count
    (ref:utils/quantize.py:128-132: norm(1,3).sum(2).sum(1)/n)."""
    return jnp.mean(jnp.abs(w), axis=_FILTER_AXES, keepdims=True)


def binarize_weight_value(w, bits_g: int):
    """XNOR-style sign(w) * mean|w| per output filter, the scale itself
    quantized to bits_g — the *intended* binarization of
    ref:utils/quantize.py:127-134 (and the packing used by the int8
    inference kernel)."""
    m = quant_q(_per_filter_mean_abs(w), bits_g)
    return jnp.sign(w) * m


def binarize_weight_value_ref(w, bits_g: int):
    """The reference's *effective* bits_w==1 forward. In
    ref:utils/quantize.py:126-149 the ``else`` is dangling on ``if bitsW == 2``,
    so after the scaled binarization the bitsW==1 case ALSO runs
    ``Q(C(w, 1), 1)`` — collapsing ``sign(w)*Q(m, bitsG)`` to the unscaled
    ``sign(w)``, zeroed wherever the quantized scale rounds to 0 (whole
    filters with mean|w| < 1/S(bitsG))."""
    m = quant_q(_per_filter_mean_abs(w), bits_g)
    return jnp.sign(w) * jnp.sign(m)


def ternarize_weight_value(w):
    """bits_w == 2: {-1, 0, +1} with threshold 0.7*mean|w| per output filter;
    NOT rescaled (ref:utils/quantize.py:135-147)."""
    d = 0.7 * _per_filter_mean_abs(w)
    return jnp.where(w > d, 1.0, 0.0) + jnp.where(w < -d, -1.0, 0.0)


def fixedpoint_weight_value(w, bits_w: int):
    """bits_w > 2: Q(C(w, bits_w), bits_w) (ref:utils/quantize.py:148-149)."""
    return quant_q(clip_c(w, bits_w), bits_w)


def _xnor_grad(w, g, bits_g: int):
    """XNOR-Net gradient for binarized weights
    (ref:utils/quantize.py:156-173; same math in BinOp,
    ref:models/cu_net_prev_version.py:78-92 without the final Q/C):

    grad <- (mean|w| [masked to |w|<=1, quantized bits_g] * g
             + per-filter-mean(g * sign(w)) * sign(w)) * (1 - 1/c_in) * n
    then Q(C(grad, bits_g), bits_g).
    """
    n = w.shape[0] * w.shape[1] * w.shape[2]  # per-filter element count
    c_in = w.shape[2]
    m = _per_filter_mean_abs(w) * jnp.ones_like(w)
    m = jnp.where((w < -1.0) | (w > 1.0), 0.0, m)
    m = quant_q(m, bits_g)
    m = m * g
    m_add = jnp.mean(g * jnp.sign(w), axis=_FILTER_AXES, keepdims=True) * jnp.sign(w)
    out = (m + m_add) * (1.0 - 1.0 / c_in) * n
    return quant_q(clip_c(out, bits_g), bits_g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fake_quant_weight(w, bits_w: int, bits_g: int):
    """Quantize a conv weight for the forward pass; the backward is the
    reference's hand-written gradient correction + gradient quantization.

    bits_w==1 reproduces the reference's EFFECTIVE behavior (unscaled
    sign(w), see :func:`binarize_weight_value_ref`); the backward still
    applies the scaled-binarization XNOR jacobian, exactly as the reference's
    ``updateQuanGradWeight`` does (ref:utils/quantize.py:156-175) — the
    reference is internally inconsistent here and we match it. bits_w>15 is
    the identity: the reference's else-branch ``Q(C(w, bitsW), bitsW)`` is
    identity-Q plus a [-1, 1] clamp that is a no-op after the master
    preprocessing already clamped to the tighter bits_g range."""
    if bits_w > 15:
        return w
    if bits_w == 1:
        return binarize_weight_value_ref(w, bits_g)
    if bits_w == 2:
        return ternarize_weight_value(w)
    return fixedpoint_weight_value(w, bits_w)


def _fqw_fwd(w, bits_w, bits_g):
    return fake_quant_weight(w, bits_w, bits_g), w


def _fqw_bwd(bits_w, bits_g, w, g):
    if bits_w > 15:
        return (g,)
    if bits_w == 1:
        return (_xnor_grad(w, g, bits_g),)
    # ternary/fixed-point: straight-through + gradient quantization
    # (ref:utils/quantize.py:174-175)
    return (quant_q(clip_c(g, bits_g), bits_g),)


fake_quant_weight.defvjp(_fqw_fwd, _fqw_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def binarize_weight(w, bits_g: int):
    """BinOp variant (ref:models/cu_net_prev_version.py:17-92): scale NOT
    quantized in forward; backward is the XNOR gradient WITHOUT the final
    gradient quantization."""
    return jnp.sign(w) * _per_filter_mean_abs(w)


def _bin_fwd(w, bits_g):
    return binarize_weight(w, bits_g), w


def _bin_bwd(bits_g, w, g):
    n = w.shape[0] * w.shape[1] * w.shape[2]
    c_in = w.shape[2]
    m = _per_filter_mean_abs(w) * jnp.ones_like(w)
    m = jnp.where((w < -1.0) | (w > 1.0), 0.0, m)
    m = m * g
    m_add = jnp.mean(g * jnp.sign(w), axis=_FILTER_AXES, keepdims=True) * jnp.sign(w)
    return ((m + m_add) * (1.0 - 1.0 / c_in) * n,)


binarize_weight.defvjp(_bin_fwd, _bin_bwd)


def meancenter_clamp_weight(w, bits_g: int):
    """Master-weight preprocessing applied once per step before quantization
    (ref:utils/quantize.py:110-123): subtract the per-(filter, spatial)
    input-channel mean, clamp to the bits_g range, and round the stored
    master copy to bits_g."""
    centered = w - jnp.mean(w, axis=2, keepdims=True)
    return quant_q(clip_c(centered, bits_g), bits_g)


def meancenter_clamp_weight_bin(w):
    """BinOp master preprocessing (ref:models/cu_net_prev_version.py:37-52):
    meancenter + clamp(-1, 1); the saved copy is NOT quantized."""
    centered = w - jnp.mean(w, axis=2, keepdims=True)
    return jnp.clip(centered, -1.0, 1.0)
