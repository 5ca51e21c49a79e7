"""Buffer-resident Pallas tera-kernel: whole CU-Net forward, zero concats.

The loop tera-kernel (cunet_tpu.kernels.fused_model) carries every FIFO as an
SSA value and builds each dense stage's input with ``jnp.concatenate`` —
measured on v5e, those VMEM copies plus the fori-loop carries account for a
large share of runtime (stage-ablation study, PARITY.md). This variant keeps
one persistent VMEM scratch buffer per block position laid out so that every
stage input is a CONTIGUOUS CHANNEL SLICE of a buffer:

  down/neck buffer: [ y(c) | fifo(g*order) | out32(g) ]
  up buffer:        [ up_y(c) | skip(c) | fifo(g*order) | out32(g) ]
  intermedia:       [ y(c) | fifo(c*order) ]

A dense stage then reads ``buf[:, :K]`` directly (no copy), writes its 3x3
output into the ``out32`` slot, and the cross-slot FIFO update is one g-wide
in-buffer copy instead of rebuilding value lists. The fori_loop over
steady-state slots carries nothing — all state lives in scratch.

Weight marshaling (and numerics) are identical to
``fused_model.fused_model_loop_infer``; only the dataflow differs.
Capability heritage: this is the TPU replacement for the reference's
shared-storage recompute runtime's *forward* economics
(ref:models/cu_net_prev_version.py:94-116 pre-sizes two shared storages so
dense blocks never re-allocate; here the shared storages are VMEM-resident
channel planes).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cunet_tpu.kernels.fused_hourglass import (
    _bottleneck_val,
    _conv3x3,
    _maxpool2,
    _upsample2,
    pack_w3,
    pack_w3_scatter,
)
from cunet_tpu.kernels.fused_model import default_batch_tile


def _affine_dot(buf, k, vec, w, dtype):
    """relu(buf[:, :k]*inv + shift) @ w — stage input read straight off the
    persistent buffer, no concat."""
    return _bottleneck_val(buf[:, :k], vec[:, :k], w[:k], dtype)


def _q8(y, s: float):
    """WAGE fixed-point activation quantization to int8: round-half-away of
    clip(y)*S (semantics of ref:utils/quantize.py:33-42; matches
    kernels.quant_matmul.quantize_activations_i8)."""
    delta = 1.0 / s
    yc = jnp.clip(y, -1.0 + delta, 1.0 - delta)
    return (jnp.sign(yc) * jnp.floor(jnp.abs(yc) * s + 0.5)).astype(jnp.int8)


def _affine_dot_i8(x, vec, w_i8, s: float):
    """relu-affine -> int8 quantize -> INT8 MXU dot -> dequant (fp32).

    The quantized model's 1x1 convs carry {-1,0,+1} weights; on the MXU int8
    multiplies at 2x bf16 throughput with exact int32 accumulation, so this
    equals the float fake-quant simulation bit-for-bit."""
    y = jnp.maximum(x.astype(jnp.float32) * vec[0, :x.shape[-1]]
                    + vec[1, :x.shape[-1]], 0.0)
    acc = jax.lax.dot_general(
        _q8(y, s), w_i8[:x.shape[-1]], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (1.0 / s)


def _model_buf_kernel(meta, *refs):  # noqa: C901
    nb = meta["num_blocks"]
    K = meta["layer_num"]
    order = meta["order"]
    start = meta["start"]
    h0 = meta["h"]
    bt = meta["bt"]
    c = meta["chan"]
    g = meta["growth"]
    dtype = meta["dtype"]

    bits_i = meta["bits_i"]          # None = float mode; else int8 execution
    s_i8 = None if not bits_i else float(2.0 ** (bits_i - 1))

    n_bufs = 2 * nb + 1
    bufs = refs[-(n_bufs + 1):-1]   # down 0..nb-1, neck, up nb-1..0 scratch
    inter_buf = refs[-1]
    refs = refs[:-(n_bufs + 1)]

    it = iter(refs)
    nxt = lambda: next(it)

    y_stem = nxt()[...].reshape(bt * h0 * h0, -1)

    def buf_at(pos):
        # traversal order: down j = pos j; neck = nb; up j = nb+1+(nb-1-j)
        return bufs[pos]

    def run_slot(i, get_wset, get_inter, get_head):
        """i is the FIFO-phase index: min(i, order) entries present."""
        link = min(i, order)
        h = w = h0
        # ---- intermedia ----
        if i == 0:
            y = y_stem
            if order > 0:
                inter_buf[:, c:2 * c] = y.astype(dtype)
        else:
            kin = c + link * c
            vec_p, w_p = get_inter()
            y = _affine_dot(inter_buf, kin, vec_p, w_p, dtype).astype(dtype)
            # rotate fifo left one c-block and push the adapter output
            if i >= order and order > 0:
                for s in range(order - 1):
                    inter_buf[:, c * (1 + s):c * (2 + s)] = \
                        inter_buf[:, c * (2 + s):c * (3 + s)][...]
                inter_buf[:, c * order:c * (order + 1)] = y
            elif order > 0:
                inter_buf[:, c * (1 + i):c * (2 + i)] = y

        def dense(pos, has_skip, is_up, h, w, y_val, skip_to=None):
            """One block at buffer ``pos``; returns ahead (value)."""
            buf = buf_at(pos)
            base = 2 * c if is_up else c      # channels before the fifo
            if not is_up:
                buf[:, :c] = y_val
            kin = base + link * g
            wset = get_wset(pos, has_skip)
            if s_i8:
                yb = _affine_dot_i8(buf[:, :kin], wset["vec_b"],
                                    wset["w_b"], s_i8)
                # int8 mode keeps BN2's full affine (scale can't fold into
                # the {-1,0,+1} weights)
                y2 = jnp.maximum(yb * wset["vec2"][0, :] + wset["vec2"][1, :],
                                 0.0)
                # conv2: quantized input (the reference's WIG insertion
                # point) -> int8 scatter dot -> exact dequant
                t = jax.lax.dot_general(
                    _q8(y2, s_i8), wset["w3"], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (1.0 / s_i8)
                gch = wset["w3"].shape[-1] // 9
                tp = jnp.pad(t.reshape(bt, h, w, 9 * gch),
                             ((0, 0), (1, 1), (1, 1), (0, 0)))
                acc = jnp.zeros((bt, h, w, gch), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        d = dy * 3 + dx
                        acc = acc + tp[:, dy:dy + h, dx:dx + w,
                                       d * gch:(d + 1) * gch]
                out32 = acc.reshape(bt * h * w, gch).astype(dtype)
            else:
                yb = _bottleneck_val(buf[:, :kin], wset["vec_b"][:, :kin],
                                     wset["w_b"][:kin], dtype)
                # vec2 scale pre-folded into w_b (models/cu_net.py _hg_wset)
                y2 = jnp.maximum(yb + wset["vec2"][1, :], 0.0).astype(dtype)
                out32 = _conv3x3(y2, wset["w3"], bt, h, w).astype(dtype)
            # out32 goes into its slot right after the *current* fifo tail so
            # the adapter input [0 : kin+g] stays one contiguous slice
            buf[:, kin:kin + g] = out32
            x2k = kin + g
            if s_i8:
                ahead = _affine_dot_i8(buf[:, :x2k], wset["vec_a"],
                                       wset["w_a"], s_i8).astype(dtype)
                if has_skip:
                    skip = _affine_dot_i8(buf[:, :x2k], wset["vec_s"],
                                          wset["w_s"], s_i8).astype(dtype)
                    skip_to[:, c:2 * c] = skip
            else:
                ahead = _bottleneck_val(buf[:, :x2k], wset["vec_a"][:, :x2k],
                                        wset["w_a"][:x2k], dtype).astype(dtype)
                if has_skip:
                    skip = _bottleneck_val(buf[:, :x2k], wset["vec_s"][:, :x2k],
                                           wset["w_s"][:x2k], dtype).astype(dtype)
                    skip_to[:, c:2 * c] = skip
            # FIFO update (ref:models/cu_net.py:133-137): growth phase keeps
            # out32 where it landed; steady state rotates the g-blocks left
            if i >= order and order > 0:
                for s in range(order - 1):
                    buf[:, base + g * s:base + g * (s + 1)] = \
                        buf[:, base + g * (s + 1):base + g * (s + 2)][...]
                buf[:, base + g * (order - 1):base + g * order] = out32
            # if i < order: out32 already sits at fifo position ``link``
            return ahead

        # ---- down path ----
        for j in range(nb):
            up_pos = nb + 1 + (nb - 1 - j)
            ahead = dense(j, True, False, h, w, y, skip_to=buf_at(up_pos))
            y = _maxpool2(ahead, h, w, bt)
            h, w = h // 2, w // 2
        # ---- neck ----
        ahead = dense(nb, False, False, h, w, y)
        y = ahead
        # ---- up path ----
        for idx, j in enumerate(reversed(range(nb))):
            pos = nb + 1 + idx
            up = _upsample2(y, h, w, bt)
            h, w = h * 2, w * 2
            buf_at(pos)[:, :c] = up
            y = dense(pos, False, True, h, w, None)
        # ---- head ----
        vec_h, w_h = get_head()
        if s_i8:  # quantized head input: WIG insertion point No.2
            hm = _affine_dot_i8(y, vec_h, w_h, s_i8).astype(dtype)
        else:
            hm = _bottleneck_val(y, vec_h, w_h, dtype).astype(dtype)
        # the hourglass output is the NEXT slot's intermedia input
        inter_buf[:, :c] = y
        return y, hm.reshape(bt, h, w, -1)

    # ---- unrolled growth-phase slots ----
    from cunet_tpu.kernels.fused_model import _read_wset_vals

    def consume_prefix():
        heads = []
        for i in range(start):
            inter_vals = None
            if i > 0:
                inter_vals = (nxt()[...], nxt()[...])
            wsets = [_read_wset_vals(nxt, j < nb) for j in range(2 * nb + 1)]
            head_vals = (nxt()[...], nxt()[...])
            _, hm = run_slot(
                i,
                get_wset=lambda pos, skip, w=wsets: w[pos],
                get_inter=lambda v=inter_vals: v,
                get_head=lambda v=head_vals: v,
            )
            heads.append(hm)
        return heads

    prefix_heads = consume_prefix()

    S = K - start
    if S > 0:
        inter_stack = (nxt(), nxt())
        block_stacks = []
        for pos in range(2 * nb + 1):
            skip = pos < nb
            st = {"vec_b": nxt(), "w_b": nxt(), "vec2": nxt(),
                  "w3": nxt(), "vec_a": nxt(), "w_a": nxt()}
            if skip:
                st["vec_s"] = nxt()
                st["w_s"] = nxt()
            block_stacks.append(st)
        head_stack = (nxt(), nxt())

    out_ref = nxt()
    for i, hm in enumerate(prefix_heads):
        out_ref[:, i] = hm

    if S > 0:
        def body(r, carry):
            _, hm = run_slot(
                max(order, 1),
                get_wset=lambda pos, skip, r=r: {
                    k: v[r] for k, v in block_stacks[pos].items()
                },
                get_inter=lambda r=r: (inter_stack[0][r], inter_stack[1][r]),
                get_head=lambda r=r: (head_stack[0][r], head_stack[1][r]),
            )
            out_ref[:, start + r] = hm
            return carry

        jax.lax.fori_loop(0, S, body, 0)


def fused_model_buf_infer(
    y_stem: jnp.ndarray,
    slot_args: Sequence[Dict],
    *,
    num_blocks: int,
    layer_num: int,
    order: int,
    class_num: int,
    batch_tile: int = 0,
    quant_bits_i: int = 0,
    interpret: bool = False,
):
    """Buffer-resident one-launch full forward. Same contract as
    ``fused_model.fused_model_loop_infer``: returns (N, K, h0, h0, class).

    ``quant_bits_i > 0`` runs the QUANTIZED model on the int8 MXU: block and
    head 1x1 convs and the 3x3 convs execute as int8 dots of {-1,0,+1}
    weights (slot_args must carry ``quant_eval_params`` output) against
    bits_i-quantized activations; intermedia adapters stay float (excluded
    from activation quantization, matching the lax int8_infer path exactly).
    In that mode the wsets must NOT have vec2 folded into w_b."""
    n, h0 = y_stem.shape[0], y_stem.shape[1]
    c = y_stem.shape[-1]
    dtype = y_stem.dtype
    start = max(order, 1)
    S = layer_num - start
    bt = batch_tile or default_batch_tile(n, h0, layer_num)
    g = slot_args[0]["blocks"][0]["w3"].shape[3]
    i8 = bool(quant_bits_i)

    def xspec(a):
        return pl.BlockSpec((bt,) + a.shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    args: List = [y_stem]
    specs: List = [xspec(y_stem)]

    def add(a):
        args.append(a)
        specs.append(full(a))

    def conv2d_mat(w):
        w2 = w[0, 0] if w.ndim == 4 else w
        return jnp.round(w2).astype(jnp.int8) if i8 else w2.astype(dtype)

    def float_mat(w):
        return (w[0, 0] if w.ndim == 4 else w).astype(dtype)

    def w3_mat(w3):
        packed = pack_w3_scatter(w3) if i8 else pack_w3(w3)
        return jnp.round(packed).astype(jnp.int8) if i8 else packed.astype(dtype)

    def pad_vec(vec, k):
        return jnp.pad(vec, ((0, 0), (0, k - vec.shape[1])))

    def pad_mat(w, k):
        return jnp.pad(w, ((0, k - w.shape[0]), (0, 0)))

    # steady-state (max) input widths per position, for uniform weight pads:
    # growth-phase slots use narrower slices of the same padded weights
    def kmax(pos):
        base = 2 * c if pos > num_blocks else c
        return base + order * g

    def add_wset(wset, pos):
        kb = kmax(pos)
        add(pad_vec(wset["vec_b"].astype(jnp.float32), kb))
        add(pad_mat(conv2d_mat(wset["w_b"]), kb))
        add(wset["vec2"].astype(jnp.float32))
        add(w3_mat(wset["w3"]))
        add(pad_vec(wset["vec_a"].astype(jnp.float32), kb + g))
        add(pad_mat(conv2d_mat(wset["w_a"]), kb + g))
        if "w_s" in wset:
            add(pad_vec(wset["vec_s"].astype(jnp.float32), kb + g))
            add(pad_mat(conv2d_mat(wset["w_s"]), kb + g))

    ki = c + order * c
    for i in range(start):
        sa = slot_args[i]
        if i > 0:
            vec, w = sa["inter"]
            add(pad_vec(vec.astype(jnp.float32), ki))
            add(pad_mat(float_mat(w), ki))
        for pos, wset in enumerate(sa["blocks"]):
            add_wset(wset, pos)
        vec, w = sa["head"]
        add(vec.astype(jnp.float32))
        add(conv2d_mat(w))

    if S > 0:
        steady = slot_args[start:]
        add(jnp.stack([pad_vec(sa["inter"][0].astype(jnp.float32), ki)
                       for sa in steady]))
        add(jnp.stack([pad_mat(float_mat(sa["inter"][1]), ki)
                       for sa in steady]))
        for pos in range(2 * num_blocks + 1):
            kb = kmax(pos)
            keys = ["vec_b", "w_b", "vec2", "w3", "vec_a", "w_a"]
            if pos < num_blocks:
                keys += ["vec_s", "w_s"]
            for k in keys:
                vals = [sa["blocks"][pos][k] for sa in steady]
                if k in ("vec_b",):
                    add(jnp.stack([pad_vec(v.astype(jnp.float32), kb) for v in vals]))
                elif k in ("vec_a", "vec_s"):
                    add(jnp.stack([pad_vec(v.astype(jnp.float32), kb + g) for v in vals]))
                elif k == "vec2":
                    add(jnp.stack([v.astype(jnp.float32) for v in vals]))
                elif k == "w3":
                    add(jnp.stack([w3_mat(v) for v in vals]))
                elif k == "w_b":
                    add(jnp.stack([pad_mat(conv2d_mat(v), kb) for v in vals]))
                else:
                    add(jnp.stack([pad_mat(conv2d_mat(v), kb + g) for v in vals]))
        add(jnp.stack([sa["head"][0] for sa in steady]).astype(jnp.float32))
        add(jnp.stack([conv2d_mat(sa["head"][1]) for sa in steady]))

    out_shape = jax.ShapeDtypeStruct((n, layer_num, h0, h0, class_num), dtype)
    out_spec = pl.BlockSpec((bt, layer_num, h0, h0, class_num),
                            lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM)

    # scratch: one channel-plane buffer per block position + intermedia
    res = [h0 // (2 ** j) for j in range(num_blocks + 1)]
    scratch = []
    for j in range(num_blocks):       # down
        scratch.append(pltpu.VMEM((bt * res[j] * res[j], c + order * g + g), dtype))
    scratch.append(pltpu.VMEM((bt * res[-1] * res[-1], c + order * g + g), dtype))
    for j in reversed(range(num_blocks)):   # up (traversal order nb-1..0)
        scratch.append(pltpu.VMEM((bt * res[j] * res[j], 2 * c + order * g + g), dtype))
    scratch.append(pltpu.VMEM((bt * h0 * h0, c + order * c), dtype))  # intermedia

    meta = dict(num_blocks=num_blocks, layer_num=layer_num, order=order,
                start=start, h=h0, bt=bt, chan=c, growth=g, dtype=dtype,
                bits_i=quant_bits_i)
    return pl.pallas_call(
        functools.partial(_model_buf_kernel, meta),
        grid=(n // bt,),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
