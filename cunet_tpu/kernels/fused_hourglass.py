"""Pallas giga-kernel: one launch per U-Net slot (inference).

The whole hourglass of a coupled-U-Net slot — intermedia adapter, 4 down
blocks (with 2x2 pools), neck, 4 up blocks (with 2x upsamples), and the
head — runs as ONE Pallas program per image. Feature maps never leave VMEM
between blocks; channel concats are VMEM copies (cheap), so each 1x1 stage
is a single full-width MXU matmul. On this launch-overhead-bound stack this
replaces ~9-11 launches per slot with 1.

Weight layout per block: vec_b (2, Cin), w_b (Cin, Cb), vec2 (2, Cb),
w3 (3, 3, Cb, G), vec_a (2, Cin+G), w_a (Cin+G, Cout) [, vec_s, w_s].
All BN affines are eval-folded [inv; shift] rows.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

_BF16_PROLOGUE = os.environ.get("CUNET_KERNEL_BF16_PROLOGUE", "0") == "1"
# 3x3 conv formulations inside the kernels (measured on v5e; see PARITY.md):
#   taps    — 9 accumulated (m, Cb)@(Cb, G) dots; N=G=32 underfills MXU lanes
#   onedot  — im2col concat on K: (m, 9Cb)@(9Cb, G); still N=32
#   scatter — ONE fat dot (m, Cb)@(Cb, 9G): N=9G=288 fills the lanes, then
#             9 shifted (VPU) adds of G-wide slices gather the taps
#   dycol   — 3 dots (one per dy) on SUBLANE-ALIGNED h-shifted slices of the
#             h-padded input, each (m, Cb)@(Cb, 3G) packing the dx taps into
#             lanes, then only 3 dx-shifted G-wide adds. Kills the scatter
#             epilogue's (m, 9G) downcast + 9G-lane pad copy and 6 of the 9
#             misaligned tap adds (the r4 ablation priced that epilogue at
#             ~25 ms of the 84.65 ms batch).
# dycol is the r5 default (measured vs scatter at K8-bt8, PARITY.md r5);
# scatter stays as the int8 path's form. The chunk-loop form is coupled to
# the conv mode (fused_model_buf.for_chunks): unrolled scatter/dycol chunks
# time out Mosaic compile at bt8, while taps+fori exceeds scoped VMEM.
_CONV3X3_MODE = os.environ.get(
    "CUNET_KERNEL_CONV3X3",
    "onedot" if os.environ.get("CUNET_KERNEL_CONV3X3_ONEDOT", "0") == "1"
    else "dycol",
)


def pack_w3_scatter(w3):
    """HWIO (3,3,Cb,G) -> (Cb, 9G) with tap-major columns, packed HOST-side
    (Mosaic cannot shape-cast the 4D weight inside a kernel)."""
    return jnp.transpose(w3, (2, 0, 1, 3)).reshape(w3.shape[2], 9 * w3.shape[3])


def pack_w3_dycol(w3):
    """HWIO (3,3,Cb,G) -> (3, Cb, 3G): per dy, the 3 dx taps side by side in
    lanes (dx-major columns), packed HOST-side."""
    return jnp.stack(
        [jnp.concatenate([w3[dy, dx] for dx in range(3)], axis=-1)
         for dy in range(3)])


def pack_w3(w3):
    """Pack a 3x3 conv weight for the active in-kernel conv mode."""
    if _CONV3X3_MODE == "scatter":
        return pack_w3_scatter(w3)
    if _CONV3X3_MODE == "dycol":
        return pack_w3_dycol(w3)
    return w3


def _conv3x3(y2, w3, b, h, w, mode=None):
    """3x3 same-padding conv on a flattened (b*h*w, Cb) value; per-image
    spatial padding (images in the batch tile never bleed into each other).
    Returns (b*h*w, G) fp32. In scatter mode ``w3`` must already be the
    host-packed (Cb, 9G) layout (see pack_w3_scatter)."""
    mode = mode or _CONV3X3_MODE
    if w3.ndim == 2:
        mode = "scatter"
    elif w3.ndim == 3:
        mode = "dycol"
    cb = y2.shape[-1]
    m = b * h * w
    dn = (((1,), (0,)), ((), ()))
    if mode == "dycol":
        # out = sum_dy slice_dy(ypad) @ W[dy] (Cb, 3G), then gather dx with
        # 3 shifted G-wide adds. The h-pad makes the per-dy input slices
        # whole-h0-row offsets (dy*w flat rows — sublane-aligned at the
        # model's resolutions), so the sliced dots need no relayout copy.
        assert w3.ndim == 3, "dycol mode needs the host-packed (3, Cb, 3G) weight"
        cout = w3.shape[-1] // 3
        if _DYCOL_PAD == "w":
            # plan A: pad w to _DYCOL_WP lanes-of-rows too, so the dx
            # windows slice the dot output directly (no second pad), at the
            # cost of wp/w extra dot rows.
            wp = _DYCOL_WP
            ypad = jnp.pad(y2.reshape(b, h, w, cb),
                           ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
            mr = b * h * wp
            S = None
            for dy in range(3):
                td = jax.lax.dot_general(
                    ypad[:, dy:dy + h].reshape(mr, cb),
                    w3[dy].astype(y2.dtype), dn,
                    preferred_element_type=jnp.float32)
                S = td if S is None else S + td
            S4 = S.reshape(b, h, wp, 3 * cout)
        else:
            # plan B (default): pad h only — the dots run on exactly m rows
            # — and pad the (m, 3G) dy-sum in w for the dx windows.
            ypad = jnp.pad(y2.reshape(b, h, w, cb),
                           ((0, 0), (1, 1), (0, 0), (0, 0)))
            S = None
            for dy in range(3):
                td = jax.lax.dot_general(
                    ypad[:, dy:dy + h].reshape(m, cb),
                    w3[dy].astype(y2.dtype), dn,
                    preferred_element_type=jnp.float32)
                S = td if S is None else S + td
            if "scatteradd" in _ABLATE:  # keep the dots, drop the dx gather
                return S[:, :cout]
            S4 = jnp.pad(S.reshape(b, h, w, 3 * cout),
                         ((0, 0), (0, 0), (1, 1), (0, 0)))
        # zeros-init accumulator (not the dx=0 slice): a slice-initialized
        # acc inherits the windowed-slice layout, and downstream CONCATs of
        # the result (the train kernels' x2 build) fail Mosaic lowering
        # with "offset mismatch on non-concat dimension"; the inference
        # kernels are concat-free (buffer writes) but share this code
        acc = jnp.zeros((b, h, w, cout), jnp.float32)
        for dx in range(3):
            acc = acc + S4[:, :, dx:dx + w, dx * cout:(dx + 1) * cout]
        return acc.reshape(m, cout)
    if mode == "scatter":
        # t[p, (dy,dx)*G:c] = y2[p] @ w3[dy,dx]; out[o] = sum_d t[o+d-1, d]
        assert w3.ndim == 2, "scatter mode needs the host-packed (Cb, 9G) weight"
        cout = w3.shape[-1] // 9
        # the per-tap matrix t is the kernel's largest transient. Default:
        # keep it in the compute dtype (bf16 halves it) and upcast each tap
        # slice into the f32 accumulator. CUNET_TAPS_F32=1 keeps t in f32
        # instead: 2x the pad/transient bytes, but drops the (m, 9G)
        # downcast pass and the 9 per-tap upcast passes.
        t32 = _TAPS_F32 and y2.dtype != jnp.float32
        if _SCATTER_PAD == "pre" and "scatteradd" not in _ABLATE:
            # pad the conv INPUT (Cb lanes) instead of the tap matrix
            # (9G lanes): padding commutes with the per-position matmul
            # (zero rows dot to zero rows), so t(pad(y)) == pad(t(y)) while
            # moving the pad-copy from 9G=288-wide to Cb=128-wide and
            # letting the fat dot produce the padded layout directly. Costs
            # (h+2)(w+2)/(hw) extra dot rows (6.5% at 64^2).
            ypad = jnp.pad(y2.reshape(b, h, w, cb),
                           ((0, 0), (1, 1), (1, 1), (0, 0)))
            t = jax.lax.dot_general(
                ypad.reshape(b * (h + 2) * (w + 2), cb),
                w3.astype(y2.dtype), dn,
                preferred_element_type=_dot_out_type(y2.dtype),
            )
            if not t32:
                t = t.astype(y2.dtype)
            tp = t.reshape(b, h + 2, w + 2, 9 * cout)
        else:
            t = jax.lax.dot_general(
                y2.astype(y2.dtype), w3.astype(y2.dtype), dn,
                preferred_element_type=_dot_out_type(y2.dtype),
            )
            if not t32:
                t = t.astype(y2.dtype)
            if "scatteradd" in _ABLATE:  # keep the dot, drop the 9 tap adds
                return t[:, :cout].astype(jnp.float32)
            tp = jnp.pad(t.reshape(b, h, w, 9 * cout),
                         ((0, 0), (1, 1), (1, 1), (0, 0)))
        # CUNET_TAPS_ACC=bf16: accumulate the 9 taps in bf16 (numerics: a
        # 9-term bf16 sum of same-scale terms loses <=3 ulp vs the f32
        # accumulate; the output is cast to bf16 either way). Skips the 9
        # per-tap upcasts and the final downcast — experiment knob.
        acc_dt = jnp.float32 if (t32 or _TAPS_ACC != "bf16") else y2.dtype
        if _SCATTER_ADD == "tree2":
            # two-level gather: sum over dy at 3G-lane width first (the tap
            # columns are dy-major, so one slice covers all three dx taps of
            # a dy), then over dx at G width. 3 + 3 slice-adds instead of 9;
            # the wide adds run at 3G=96 lanes instead of G=32 — VPU vregs
            # are 128 lanes, so a G-wide add wastes 3/4 of the lanes.
            w3g = tp[:, 0:h, :, 0:3 * cout].astype(acc_dt)
            for dy in (1, 2):
                w3g = w3g + tp[:, dy:dy + h, :,
                               dy * 3 * cout:(dy + 1) * 3 * cout].astype(acc_dt)
            acc = w3g[:, :, 0:w, 0:cout]
            for dx in (1, 2):
                acc = acc + w3g[:, :, dx:dx + w, dx * cout:(dx + 1) * cout]
            return acc.reshape(m, cout)
        acc = jnp.zeros((b, h, w, cout), acc_dt)
        for dy in range(3):
            for dx in range(3):
                d = dy * 3 + dx
                acc = acc + tp[:, dy:dy + h, dx:dx + w,
                               d * cout:(d + 1) * cout].astype(acc_dt)
        return acc.reshape(m, cout)
    cout = w3.shape[-1]
    ypad = jnp.pad(y2.reshape(b, h, w, cb), ((0, 0), (1, 1), (1, 1), (0, 0)))
    if mode == "onedot":
        taps = jnp.concatenate(
            [ypad[:, dy:dy + h, dx:dx + w, :].reshape(m, cb)
             for dy in range(3) for dx in range(3)], axis=-1,
        )
        w_flat = w3[...].reshape(9 * cb, cout)
        return jax.lax.dot_general(
            taps.astype(y2.dtype), w_flat, dn, preferred_element_type=jnp.float32
        )
    acc = jnp.zeros((m, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = ypad[:, dy:dy + h, dx:dx + w, :].reshape(m, cb)
            acc = acc + jax.lax.dot_general(
                tap.astype(y2.dtype), w3[dy, dx], dn,
                preferred_element_type=jnp.float32,
            )
    return acc


# NOTE: emitting bf16 straight from the dots (preferred_element_type=bf16)
# to skip the f32 VMEM round-trip is NOT possible — Mosaic verification
# requires a 32-bit matmul accumulator ("Expected matmul acc to be 32-bit").
def _dot_out_type(dtype):
    return jnp.float32


def _bottleneck_val(x_cat, vec, w, dtype):
    """relu(x*inv + shift) @ w on a concatenated (m, Cin) value."""
    if "affine" in _ABLATE:
        y = x_cat
    elif _BF16_PROLOGUE and dtype == jnp.bfloat16:
        y = jnp.maximum(
            x_cat.astype(dtype) * vec[0, :].astype(dtype)
            + vec[1, :].astype(dtype), 0,
        )
    else:
        y = jnp.maximum(x_cat.astype(jnp.float32) * vec[0, :] + vec[1, :], 0.0)
    return jax.lax.dot_general(
        y.astype(dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=_dot_out_type(dtype),
    )


# Perf-diagnosis ablations (WRONG RESULTS — dev only): comma list in
# CUNET_ABLATE of {conv, bottleneck, adapters, skipad, concat}. Each drops a
# stage while preserving all shapes so the rest of the kernel times the same.
_ABLATE = frozenset(
    a for a in os.environ.get("CUNET_ABLATE", "").split(",") if a
)


def _block_stage(x_cat, wset, h, w, dtype, b=1):
    """One dense block on VMEM values (``b`` images flattened together).
    wset: dict of loaded weight arrays. Returns (ahead, skip_or_None,
    layer_out) as (b*h*w, C) fp32/bf16 values."""
    m = b * h * w
    cb = wset["w_b"].shape[-1]
    if "bottleneck" in _ABLATE:
        yb = jnp.broadcast_to(x_cat[:, :1], (m, cb)).astype(jnp.float32)
    else:
        yb = _bottleneck_val(x_cat, wset["vec_b"], wset["w_b"], dtype)
    if "vec2" in _ABLATE:
        y2 = yb.astype(dtype)
    else:
        # vec2's scale is pre-folded into w_b's columns (models/cu_net.py
        # _hg_wset), so this stage is add+relu only; row 0 is all-ones.
        y2 = jnp.maximum(yb + wset["vec2"][1, :].astype(yb.dtype),
                         0.0).astype(dtype)
    g = wset["w3"].shape[-1] // {2: 9, 3: 3}.get(wset["w3"].ndim, 1)
    if "conv" in _ABLATE:
        out32 = y2[:, :g]
    else:
        out32 = _conv3x3(y2, wset["w3"], b, h, w).astype(dtype)
    if "concat" in _ABLATE:
        x2 = x_cat  # shapes differ: pair with weight row slice below
    else:
        x2 = jnp.concatenate([x_cat, out32], axis=-1)
    wa = wset["w_a"][: x2.shape[-1]]
    if "adapters" in _ABLATE:
        ahead = x2[:, : wa.shape[-1]].astype(dtype)
    else:
        ahead = _bottleneck_val(x2, wset["vec_a"][:, : x2.shape[-1]], wa,
                                dtype).astype(dtype)
    skip = None
    if "w_s" in wset:
        if "adapters" in _ABLATE or "skipad" in _ABLATE:
            skip = ahead
        else:
            skip = _bottleneck_val(
                x2, wset["vec_s"][:, : x2.shape[-1]],
                wset["w_s"][: x2.shape[-1]], dtype
            ).astype(dtype)
    return ahead, skip, out32


# max2step measures +3.3% end-to-end over the 6D double-max on v5e.
# cat upsample == broadcast upsample in speed at real dims (2816 vs 2818
# img/s) but the broadcast reshape is an unsupported Mosaic shape cast at
# small channel counts (c=16 test configs); repeat is 2% slower (rejected).
_POOL_MODE = os.environ.get("CUNET_POOL_MODE", "max2step")
_UPS_MODE = os.environ.get("CUNET_UPS_MODE", "cat")
_TAPS_F32 = os.environ.get("CUNET_TAPS_F32", "0") == "1"
_TAPS_ACC = os.environ.get("CUNET_TAPS_ACC", "f32")
_SCATTER_ADD = os.environ.get("CUNET_SCATTER_ADD", "flat9")
_SCATTER_PAD = os.environ.get("CUNET_SCATTER_PAD", "post")
_DYCOL_PAD = os.environ.get("CUNET_DYCOL_PAD", "s")
_DYCOL_WP = int(os.environ.get("CUNET_DYCOL_WP", "72"))


def _maxpool2(x, h, w, b=1):
    c = x.shape[-1]
    if "pools" in _ABLATE:  # cheapest shape-preserving stand-in
        return x.reshape(b, h, w, c)[:, : h // 2, : w // 2, :].reshape(
            b * (h // 2) * (w // 2), c)
    if _POOL_MODE == "max2step":
        # two single-axis maxes over 5D views instead of one 6D double-max
        x5 = x.reshape(b, h // 2, 2, w, c)
        m1 = jnp.maximum(x5[:, :, 0], x5[:, :, 1])       # (b, h/2, w, c)
        m5 = m1.reshape(b, h // 2, w // 2, 2, c)
        return jnp.maximum(m5[:, :, :, 0], m5[:, :, :, 1]).reshape(
            b * (h // 2) * (w // 2), c)
    return jnp.max(
        x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4)
    ).reshape(b * (h // 2) * (w // 2), c)


def _upsample2(x, h, w, b=1):
    c = x.shape[-1]
    if "pools" in _ABLATE:
        return jnp.pad(x.reshape(b, h, w, c),
                       ((0, 0), (0, h), (0, w), (0, 0))).reshape(
            b * (2 * h) * (2 * w), c)
    if _UPS_MODE == "cat":
        x4 = x.reshape(b, h, w, c)
        xw = jnp.concatenate([x4[:, :, :, None, :], x4[:, :, :, None, :]],
                             axis=3).reshape(b, h, 2 * w, c)
        xh = jnp.concatenate([xw[:, :, None, :, :], xw[:, :, None, :, :]],
                             axis=2)
        return xh.reshape(b * 2 * h * 2 * w, c)
    if _UPS_MODE == "repeat":
        # native Mosaic repeat on the row dim twice (w then h): rows of the
        # flat (b*h*w, c) view are (b, h, w)-major, so repeating rows
        # interleaves w-neighbours only after a per-row duplication — use
        # pltpu.repeat on reshaped 2D views
        xw = pltpu.repeat(x.reshape(b * h * w, 1, c), 2, 1)
        xw = xw.reshape(b, h, 2 * w, c)   # (.., w, 2, c) -> w-duplicated
        xh = pltpu.repeat(xw.reshape(b * h, 1, 2 * w * c), 2, 1)
        return xh.reshape(b * 2 * h * 2 * w, c)
    x = x.reshape(b, h, w, c)
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b * (2 * h) * (2 * w), c)


def _hg_kernel(meta, *refs):
    nb = meta["num_blocks"]
    n_fifo = meta["n_fifo"]
    emit = meta["emit_layer_out"]
    h0 = meta["h"]
    dtype = meta["dtype"]
    has_inter = meta["has_inter"]

    it = iter(refs)
    nxt = lambda: next(it)

    y_ref = nxt()
    y = y_ref[0]  # (h0, w0, c)
    h = w = h0
    m = h * w

    # ---- intermedia pre-stage ----
    if has_inter:
        inter_fifo = [nxt()[0] for _ in range(n_fifo)]
        vec_p, w_p = nxt(), nxt()
        x_cat = jnp.concatenate([y.reshape(m, -1)] + [f.reshape(m, -1) for f in inter_fifo], axis=-1)
        pre_out = _bottleneck_val(x_cat, vec_p, w_p[...], dtype).astype(dtype)
        y = pre_out.reshape(h, w, -1)
    else:
        pre_out = None

    def read_wset(skip):
        wset = {"vec_b": nxt(), "w_b": nxt()[...], "vec2": nxt(),
                "w3": nxt()[...], "vec_a": nxt(), "w_a": nxt()[...]}
        if skip:
            wset["vec_s"] = nxt()
            wset["w_s"] = nxt()[...]
        return wset

    def read_fifo(hh):
        return [nxt()[0].reshape(hh * hh, -1) for _ in range(n_fifo)]

    # ---- down path ----
    skips: List = []
    layer_outs: List = []
    for j in range(nb):
        fifo = read_fifo(h)
        wset = read_wset(skip=True)
        x_cat = jnp.concatenate([y.reshape(m, -1)] + fifo, axis=-1)
        ahead, skip, out32 = _block_stage(x_cat, wset, h, w, dtype)
        layer_outs.append((out32, h))
        skips.append((skip, h))
        y = _maxpool2(ahead, h, w)
        h, w = h // 2, w // 2
        m = h * w
        y = y.reshape(h, w, -1)

    # ---- neck ----
    fifo = read_fifo(h)
    wset = read_wset(skip=False)
    x_cat = jnp.concatenate([y.reshape(m, -1)] + fifo, axis=-1)
    ahead, _, out32 = _block_stage(x_cat, wset, h, w, dtype)
    layer_outs.append((out32, h))
    y = ahead.reshape(h, w, -1)

    # ---- up path ----
    for j in reversed(range(nb)):
        up = _upsample2(y, h, w)
        h, w = h * 2, w * 2
        m = h * w
        fifo = read_fifo(h)
        skip_val, _ = skips[j]
        wset = read_wset(skip=False)
        x_cat = jnp.concatenate([up, skip_val.reshape(m, -1)] + fifo, axis=-1)
        ahead, _, out32 = _block_stage(x_cat, wset, h, w, dtype)
        layer_outs.append((out32, h))
        y = ahead.reshape(h, w, -1)

    # ---- head ----
    vec_h, w_h = nxt(), nxt()
    hm = _bottleneck_val(y.reshape(m, -1), vec_h, w_h[...], dtype).astype(dtype)

    # ---- outputs ----
    out_y = nxt()
    out_y[0] = y
    out_hm = nxt()
    out_hm[0] = hm.reshape(h, w, -1)
    if has_inter and emit:
        out_pre = nxt()
        out_pre[0] = pre_out.reshape(h0, h0, -1)
    if emit:
        for out32, hh in layer_outs:
            o = nxt()
            o[0] = out32.reshape(hh, hh, -1)


def fused_hourglass_infer(
    y: jnp.ndarray,
    inter_fifo: Sequence[jnp.ndarray],
    inter_vec, inter_w,
    block_fifos: Sequence[Sequence[jnp.ndarray]],   # down0..3, neck, up3..0 order
    block_wsets: Sequence[Dict],                    # same order; dicts of arrays
    head_vec, head_w,
    *,
    num_blocks: int = 4,
    n_fifo: int = 1,
    emit_layer_out: bool = True,
    interpret: bool = False,
):
    """One-launch hourglass slot. ``block_fifos``/``block_wsets`` ordered:
    down 0..nb-1, neck, up nb-1..0 (traversal order). Returns
    (y_out, head_out[, pre_out][, layer_outs...]) with layer_outs in
    traversal order."""
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    n = y.shape[0]
    h0 = y.shape[1]
    dtype = y.dtype
    has_inter = inter_w is not None

    def xspec(a):
        return pl.BlockSpec((1,) + a.shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    args: List = [y]
    specs: List = [xspec(y)]

    def add(a, spec):
        args.append(a)
        specs.append(spec(a))

    if has_inter:
        for f in inter_fifo:
            add(f, xspec)
        add(inter_vec.astype(jnp.float32), full)
        add(inter_w[0, 0].astype(dtype), full)

    # traversal resolutions
    res = []
    hh = h0
    for j in range(num_blocks):
        res.append(hh)
        hh //= 2
    res.append(hh)          # neck
    for j in range(num_blocks):
        hh *= 2
        res.append(hh)
    for bi, (fifo, wset) in enumerate(zip(block_fifos, block_wsets)):
        for f in fifo:
            add(f, xspec)
        add(wset["vec_b"].astype(jnp.float32), full)
        add(wset["w_b"][0, 0].astype(dtype) if wset["w_b"].ndim == 4 else wset["w_b"].astype(dtype), full)
        add(wset["vec2"].astype(jnp.float32), full)
        add(pack_w3(wset["w3"]).astype(dtype), full)
        add(wset["vec_a"].astype(jnp.float32), full)
        add(wset["w_a"][0, 0].astype(dtype) if wset["w_a"].ndim == 4 else wset["w_a"].astype(dtype), full)
        if "w_s" in wset:
            add(wset["vec_s"].astype(jnp.float32), full)
            add(wset["w_s"][0, 0].astype(dtype) if wset["w_s"].ndim == 4 else wset["w_s"].astype(dtype), full)
    add(head_vec.astype(jnp.float32), full)
    add(head_w[0, 0].astype(dtype), full)

    c = y.shape[-1]
    c_head = head_w.shape[3]
    g = block_wsets[0]["w3"].shape[3]
    out_shapes = [
        jax.ShapeDtypeStruct((n, h0, h0, c), dtype),
        jax.ShapeDtypeStruct((n, h0, h0, c_head), dtype),
    ]
    if has_inter and emit_layer_out:
        out_shapes.append(jax.ShapeDtypeStruct((n, h0, h0, c), dtype))
    if emit_layer_out:
        for hh in res:
            out_shapes.append(jax.ShapeDtypeStruct((n, hh, hh, g), dtype))
    def ospec(sh):
        return pl.BlockSpec((1,) + tuple(sh.shape[1:]), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [ospec(sh) for sh in out_shapes]

    meta = dict(num_blocks=num_blocks, n_fifo=n_fifo,
                emit_layer_out=emit_layer_out, h=h0, dtype=dtype,
                has_inter=has_inter)
    outs = pl.pallas_call(
        functools.partial(_hg_kernel, meta),
        grid=(n,),
        in_specs=specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return outs
