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
import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cunet_tpu.kernels.fused_hourglass as _fh
from cunet_tpu.kernels.fused_hourglass import (
    _ABLATE,
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


# CUNET_UPS_DOT=low: the ups/dot commute. Upsample is row duplication, and
# BN affine + relu are elementwise, so for the up-lane slice of an up
# block's two dots
#     relu(affine(ups(y))) @ W[:c]  ==  ups(relu(affine(y)) @ W[:c])
# — the y contribution can be computed at the PRODUCER's resolution (4x
# fewer rows, 25% of the MACs) and upsampled as a dot RESULT. The producer
# then stores the low-res y itself (quarter rows of the ups-lane region,
# image-major) instead of materializing ups(y), and the consumer adds one
# upsampled (m, cb+c) partial to the two lane-sliced dots. Exact up to f32
# summation order (the K dim of each dot splits in two).
# CUNET_LOWDOT_DT=bf16 carries the upsampled partial in bf16 (halves the
# ups bytes, ~0.4% rel rounding on that partial); default f32 is exact.
_UPS_DOT = os.environ.get("CUNET_UPS_DOT", "hi")
_LOWDOT_DT = os.environ.get("CUNET_LOWDOT_DT", "f32")


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


def chunk_plan(bt: int, h0: int, num_blocks: int, rows_target: int = 0,
               layer_num: int = 8):
    """Images per stage-chunk, by resolution.

    The grid batch tile ``bt`` amortizes per-op fixed latency at the
    M-starved low resolutions (8x8/4x4), but running the HIGH-res stages on
    all ``bt`` images at once scales their transients (the scatter-conv tap
    matrix, affine upcasts) linearly with bt — that is what capped the
    round-2 kernel at bt=2 (bt=4 needed ~172 MB of 128 MB VMEM). Instead
    every stage loops over image chunks sized so its row count stays around
    ``rows_target`` (default 4096 — the largest level measured to fit v5e
    VMEM at bt=8 with the HBM head/stem DMA): low-res stages take the whole
    tile in one chunk, high-res stages split.
    """
    # K=16 keeps ~2x the resident weights, so its stage transients schedule
    # better at half the chunk rows (r5g: 2001.3 img/s at 2048 vs 1972.7 at
    # the K8-tuned 4096 and 1970.1 at 8192)
    default_rows = "2048" if layer_num > 8 else "4096"
    rows_target = rows_target or int(
        os.environ.get("CUNET_TERA_CHUNK_ROWS", default_rows))
    plan = {}
    res = h0
    for _ in range(num_blocks + 1):
        ci = bt
        while ci > 1 and ci * res * res > rows_target:
            ci //= 2
        if bt % ci:
            raise ValueError(
                f"stage chunk {ci} does not divide batch tile {bt} at "
                f"res {res}; use a power-of-two CUNET_TERA_BATCH_TILE")
        plan[res] = ci
        res //= 2
    return plan


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
    chunks = meta["chunks"]          # res -> images per stage chunk

    bits_i = meta["bits_i"]          # None = float mode; else int8 execution
    s_i8 = None if not bits_i else float(2.0 ** (bits_i - 1))

    n_bufs = 2 * nb + 1
    # scratch tail: down 0..nb-1, neck, up nb-1..0, intermedia, head staging,
    # DMA semaphore
    bufs = refs[-(n_bufs + 3):-3]
    inter_buf, head_stage, head_sem = refs[-3], refs[-2], refs[-1]
    refs = refs[:-(n_bufs + 3)]

    # refs = [y_stem, *weights, out] (inputs then outputs, scratch stripped)
    y_stem_ref = refs[0]
    out_ref = refs[-1]              # FULL (n, K, h0, h0, cls) array in HBM
    it = iter(refs[1:-1])
    nxt = lambda: next(it)
    img0 = pl.program_id(0) * bt    # first image of this grid step

    def dma_head(u, ci, hm, slot):
        """Ship one head chunk straight to HBM. Keeping the (bt, K, h0, h0,
        cls) output VMEM-windowed cost 2 x bt x K x h0^2 x cls x 2B of VMEM
        (64 MB at bt=4 / K=8 — the allocation that capped the batch tile);
        staging one chunk and DMAing it out reduces that to one chunk.

        Mosaic constraints shape the HBM layout: a memref slice must keep
        the minor dim lane-aligned (cls=16 < 128 is not DMA-sliceable) and
        lane-merging reshapes ((rows,16)->(..,h0*cls)) don't lower — so the
        out array is (n, K, cls, h0*h0) and each image's head is 2-D
        transposed (supported) into the staging buffer."""
        if "headdma" in _ABLATE:      # timing probe: output stays garbage
            return
        m = h0 * h0
        for im in range(ci):
            head_stage[im] = jnp.transpose(hm[im * m:(im + 1) * m])
        cp = pltpu.make_async_copy(
            head_stage, out_ref.at[pl.ds(img0 + u * ci, ci), slot], head_sem)
        cp.start()
        cp.wait()

    def buf_at(pos):
        # traversal order: down j = pos j; neck = nb; up j = nb+1+(nb-1-j)
        return bufs[pos]

    def rows(res, u):
        """Row slice of a (bt*res*res, C) buffer for image chunk u
        (``u`` may be a traced fori_loop index)."""
        ci = chunks[res]
        m = ci * res * res
        return pl.ds(u * m, m)

    def for_chunks(n, body):
        """body(u) for u in [0, n): the default loop form is coupled to the
        conv3x3 mode (fused_hourglass._CONV3X3_MODE). Scatter mode MUST use
        the dynamic fori loop — unrolling replicates the 9-tap scatter body
        per chunk and Mosaic compile times out (>900 s) at bt=8 — and the
        pair is the r4-measured record (3345 img/s). Taps mode keeps the
        unrolled chunks (measured ~1.5% faster than fori at bt=4; Mosaic
        pipelines across the unrolled copies, and taps+fori exceeds scoped
        VMEM at bt=8). CUNET_CHUNK_LOOP={fori,unroll} overrides. The mode is
        read off the live module attribute (not the import-time value) so a
        runtime override of fused_hourglass._CONV3X3_MODE keeps the loop
        form coupled to the conv mode it will actually run."""
        default_loop = ("fori" if _fh._CONV3X3_MODE in ("scatter", "dycol")
                        else "unroll")
        if n <= 1 or os.environ.get("CUNET_CHUNK_LOOP", default_loop) != "fori":
            for u in range(n):
                body(u)
        elif n % 2 == 0 and os.environ.get("CUNET_CHUNK_PAIR", "0") == "1":
            # pair mode: two independent image chunks per fori step — their
            # dots share no data, exposing ILP across the chunk boundary to
            # the Mosaic scheduler (the kernel is MXU-issue-bound at ~63%
            # of padded-tile peak, PARITY.md r5). Costs 2x the per-chunk
            # transients.
            def _b2(u, carry):
                body(2 * u)
                body(2 * u + 1)
                return carry
            jax.lax.fori_loop(0, n // 2, _b2, 0)
        else:
            def _b(u, carry):
                body(u)
                return carry
            jax.lax.fori_loop(0, n, _b, 0)

    def run_slot(i, get_wset, get_inter, get_head, write_head):
        """i is the FIFO-phase index: min(i, order) entries present."""
        link = min(i, order)

        # ---- intermedia (res h0): write output straight into down0 ----
        d0 = buf_at(0)

        def inter_chunk(u):
            r = rows(h0, u)
            if i == 0:
                # y_stem lives in HBM ((n*h0*h0, c) 2-D so shapes line up);
                # DMA the chunk straight into the scratch buffers — a VMEM
                # window would cost 2 x bt x h0^2 x c x 2B (16.8 MB at bt=8)
                m = chunks[h0] * h0 * h0
                row0 = img0 * h0 * h0 + u * m
                cp = pltpu.make_async_copy(
                    y_stem_ref.at[pl.ds(row0, m)],
                    d0.at[pl.ds(u * m, m), pl.ds(0, c)], head_sem)
                cp.start()
                cp.wait()
                if order > 0:
                    cp = pltpu.make_async_copy(
                        y_stem_ref.at[pl.ds(row0, m)],
                        inter_buf.at[pl.ds(u * m, m), pl.ds(c, c)], head_sem)
                    cp.start()
                    cp.wait()
            else:
                kin = c + link * c
                vec_p, w_p = get_inter()
                y = _affine_dot(inter_buf[r], kin, vec_p, w_p,
                                dtype).astype(dtype)
                d0[r, :c] = y
                # rotate fifo left one c-block and push the adapter output
                if "fifo" in _ABLATE:
                    pass
                elif i >= order and order > 0:
                    for s in range(order - 1):
                        inter_buf[r, c * (1 + s):c * (2 + s)] = \
                            inter_buf[r, c * (2 + s):c * (3 + s)][...]
                    inter_buf[r, c * order:c * (order + 1)] = y
                elif order > 0:
                    inter_buf[r, c * (1 + i):c * (2 + i)] = y

        for_chunks(bt // chunks[h0], inter_chunk)

        def dense(pos, has_skip, is_up, res, forward):
            """One block at buffer ``pos``, chunked over images.

            ``forward(u, ci, ahead)`` consumes each chunk's ahead value
            (pool-write / upsample-write / head+inter write) at the
            producer's chunk granularity."""
            buf = buf_at(pos)
            base = 2 * c if is_up else c      # channels before the fifo
            kin = base + link * g
            wset = get_wset(pos, has_skip)
            ci = chunks[res]

            def chunk_body(u):
                r = rows(res, u)
                # lowdot (see _UPS_DOT above): the producer left the
                # low-res y in the first quarter rows of the ups-lane
                # region; both up-block dots run lane-sliced [c:*] at this
                # resolution, plus one upsampled low-res partial each.
                lowdot = _UPS_DOT == "low" and is_up and not s_i8
                up_b = up_a = None
                if lowdot:
                    res_lo = res // 2
                    m_lo = ci * res_lo * res_lo
                    y_lo = buf[pl.ds(u * m_lo, m_lo), :c]
                    t_b = _bottleneck_val(y_lo, wset["vec_b"][:, :c],
                                          wset["w_b"][:c], dtype)
                    t_a = _bottleneck_val(y_lo, wset["vec_a"][:, :c],
                                          wset["w_a"][:c], dtype)
                    ldt = jnp.bfloat16 if _LOWDOT_DT == "bf16" else jnp.float32
                    t_cat = jnp.concatenate([t_b, t_a], axis=-1).astype(ldt)
                    up_cat = _upsample2(t_cat, res_lo, res_lo, ci)
                    cbw = t_b.shape[-1]
                    up_b = up_cat[:, :cbw].astype(jnp.float32)
                    up_a = up_cat[:, cbw:].astype(jnp.float32)
                if s_i8:
                    yb = _affine_dot_i8(buf[r, :kin], wset["vec_b"],
                                        wset["w_b"], s_i8)
                    # int8 mode keeps BN2's full affine (scale can't fold
                    # into the {-1,0,+1} weights)
                    y2 = jnp.maximum(
                        yb * wset["vec2"][0, :] + wset["vec2"][1, :], 0.0)
                    # conv2: quantized input (the reference's WIG insertion
                    # point) -> int8 scatter dot -> exact dequant
                    t = jax.lax.dot_general(
                        _q8(y2, s_i8), wset["w3"], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * (1.0 / s_i8)
                    gch = wset["w3"].shape[-1] // 9
                    tp = jnp.pad(t.reshape(ci, res, res, 9 * gch),
                                 ((0, 0), (1, 1), (1, 1), (0, 0)))
                    acc = jnp.zeros((ci, res, res, gch), jnp.float32)
                    for dy in range(3):
                        for dx in range(3):
                            d = dy * 3 + dx
                            acc = acc + tp[:, dy:dy + res, dx:dx + res,
                                           d * gch:(d + 1) * gch]
                    out32 = acc.reshape(ci * res * res, gch).astype(dtype)
                else:
                    if "bottleneck" in _ABLATE:  # timing probe: wrong values
                        yb = buf[r, :wset["w_b"].shape[-1]].astype(jnp.float32)
                    elif "uplow" in _ABLATE and is_up:
                        # timing probe (wrong values): price the ups/dot
                        # commute — the up-block dots skip the ups lanes
                        # [0:c) (their contribution would be computed at
                        # the producer's resolution, 4x fewer rows, and
                        # upsampled as a dot RESULT) and the producer skips
                        # the ups write. Upper bound for the "lowdot"
                        # restructure; its new costs (2 low-res dots + one
                        # (m, 2c) ups + 2 adds) are priced by pass_model.
                        yb = _bottleneck_val(buf[r, c:kin],
                                             wset["vec_b"][:, c:kin],
                                             wset["w_b"][c:kin], dtype)
                    elif lowdot:
                        yb = _bottleneck_val(buf[r, c:kin],
                                             wset["vec_b"][:, c:kin],
                                             wset["w_b"][c:kin],
                                             dtype) + up_b
                    else:
                        yb = _bottleneck_val(buf[r, :kin],
                                             wset["vec_b"][:, :kin],
                                             wset["w_b"][:kin], dtype)
                    # vec2 scale pre-folded into w_b (models/cu_net.py
                    # _hg_wset)
                    if "vec2" in _ABLATE:
                        y2 = yb.astype(dtype)
                    else:
                        y2 = jnp.maximum(yb + wset["vec2"][1, :],
                                         0.0).astype(dtype)
                    if "conv" in _ABLATE:
                        out32 = y2[:, :g]
                    else:
                        out32 = _conv3x3(y2, wset["w3"], ci, res,
                                         res).astype(dtype)
                # out32 goes into its slot right after the *current* fifo
                # tail so the adapter input [0 : kin+g] stays one
                # contiguous slice
                buf[r, kin:kin + g] = out32
                x2k = kin + g
                if s_i8:
                    ahead = _affine_dot_i8(buf[r, :x2k], wset["vec_a"],
                                           wset["w_a"], s_i8).astype(dtype)
                    if has_skip:
                        skip = _affine_dot_i8(buf[r, :x2k], wset["vec_s"],
                                              wset["w_s"], s_i8).astype(dtype)
                        up_pos = nb + 1 + (nb - 1 - pos)
                        buf_at(up_pos)[r, c:2 * c] = skip
                elif "adapters" in _ABLATE:  # timing probe: wrong values
                    ahead = buf[r, :c][...]
                    if has_skip:
                        up_pos = nb + 1 + (nb - 1 - pos)
                        buf_at(up_pos)[r, c:2 * c] = ahead
                elif "uplow" in _ABLATE and is_up:
                    ahead = _bottleneck_val(buf[r, c:x2k],
                                            wset["vec_a"][:, c:x2k],
                                            wset["w_a"][c:x2k],
                                            dtype).astype(dtype)
                elif lowdot:
                    ahead = (_bottleneck_val(buf[r, c:x2k],
                                             wset["vec_a"][:, c:x2k],
                                             wset["w_a"][c:x2k], dtype)
                             + up_a).astype(dtype)
                else:
                    ahead = _bottleneck_val(buf[r, :x2k],
                                            wset["vec_a"][:, :x2k],
                                            wset["w_a"][:x2k],
                                            dtype).astype(dtype)
                    if has_skip:
                        skip = _bottleneck_val(buf[r, :x2k],
                                               wset["vec_s"][:, :x2k],
                                               wset["w_s"][:x2k],
                                               dtype).astype(dtype)
                        up_pos = nb + 1 + (nb - 1 - pos)
                        buf_at(up_pos)[r, c:2 * c] = skip
                # FIFO update (ref:models/cu_net.py:133-137): growth phase
                # keeps out32 where it landed; steady state rotates left
                if "fifo" in _ABLATE:
                    pass
                elif i >= order and order > 0:
                    for s in range(order - 1):
                        buf[r, base + g * s:base + g * (s + 1)] = \
                            buf[r, base + g * (s + 1):base + g * (s + 2)][...]
                    buf[r, base + g * (order - 1):base + g * order] = out32
                # if i < order: out32 already sits at fifo position ``link``
                forward(u, ci, ahead)

            for_chunks(bt // ci, chunk_body)

        # ---- down path ----
        res = h0
        for j in range(nb):
            nxt_buf = buf_at(j + 1)

            def fwd_pool(u, ci, ahead, res=res, nxt_buf=nxt_buf):
                pooled = _maxpool2(ahead, res, res, ci)
                m2 = ci * (res // 2) * (res // 2)
                nxt_buf[pl.ds(u * m2, m2), :c] = pooled

            dense(j, True, False, res, fwd_pool)
            res //= 2
        # ---- neck ----
        up0 = buf_at(nb + 1)

        def fwd_up_neck(u, ci, ahead, res=res, nxt_buf=up0):
            if "uplow" in _ABLATE:  # consumer dots skip the ups lanes
                return
            if _UPS_DOT == "low" and not s_i8:
                # lowdot: store y itself at its own resolution (quarter
                # rows, image-major); the consumer computes the up-lane
                # dot partials here and upsamples the RESULTS
                m_lo = ci * res * res
                nxt_buf[pl.ds(u * m_lo, m_lo), :c] = ahead
                return
            up = _upsample2(ahead, res, res, ci)
            m2 = ci * (res * 2) * (res * 2)
            nxt_buf[pl.ds(u * m2, m2), :c] = up

        dense(nb, False, False, res, fwd_up_neck)
        # ---- up path ----
        for idx, j in enumerate(reversed(range(nb))):
            pos = nb + 1 + idx
            res *= 2
            if idx < nb - 1:
                nxt_buf = buf_at(pos + 1)

                def fwd_up(u, ci, ahead, res=res, nxt_buf=nxt_buf):
                    if "uplow" in _ABLATE:  # consumer dots skip the ups lanes
                        return
                    if _UPS_DOT == "low" and not s_i8:
                        m_lo = ci * res * res
                        nxt_buf[pl.ds(u * m_lo, m_lo), :c] = ahead
                        return
                    up = _upsample2(ahead, res, res, ci)
                    m2 = ci * (res * 2) * (res * 2)
                    nxt_buf[pl.ds(u * m2, m2), :c] = up

                dense(pos, False, True, res, fwd_up)
            else:
                # last up block (res h0): ahead is the slot output — it
                # seeds the next slot's intermedia input AND feeds the head
                vec_h, w_h = get_head()

                def fwd_head(u, ci, ahead):
                    r = rows(h0, u)
                    inter_buf[r, :c] = ahead
                    if s_i8:  # quantized head: WIG insertion point No.2
                        hm = _affine_dot_i8(ahead, vec_h, w_h,
                                            s_i8).astype(dtype)
                    else:
                        hm = _bottleneck_val(ahead, vec_h, w_h,
                                             dtype).astype(dtype)
                    write_head(u, ci, hm)

                dense(pos, False, True, res, fwd_head)

    # ---- unrolled growth-phase slots ----
    from cunet_tpu.kernels.fused_model import _read_wset_vals

    for i in range(start):
        inter_vals = None
        if i > 0:
            inter_vals = (nxt()[...], nxt()[...])
        wsets = [_read_wset_vals(nxt, j < nb) for j in range(2 * nb + 1)]
        head_vals = (nxt()[...], nxt()[...])

        def write_head(u, ci, hm, i=i):
            dma_head(u, ci, hm, i)

        run_slot(
            i,
            get_wset=lambda pos, skip, w=wsets: w[pos],
            get_inter=lambda v=inter_vals: v,
            get_head=lambda v=head_vals: v,
            write_head=write_head,
        )

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

        def body(r, carry):
            def write_head(u, ci, hm):
                dma_head(u, ci, hm, start + r)

            run_slot(
                max(order, 1),
                get_wset=lambda pos, skip, r=r: {
                    k: v[r] for k, v in block_stacks[pos].items()
                },
                get_inter=lambda r=r: (inter_stack[0][r], inter_stack[1][r]),
                get_head=lambda r=r: (head_stack[0][r], head_stack[1][r]),
                write_head=write_head,
            )
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
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    n, h0 = y_stem.shape[0], y_stem.shape[1]
    c = y_stem.shape[-1]
    dtype = y_stem.dtype
    start = max(order, 1)
    S = layer_num - start
    bt = batch_tile or default_batch_tile(n, h0, layer_num)
    g = slot_args[0]["blocks"][0]["w3"].shape[3]
    i8 = bool(quant_bits_i)

    def xspec(a):
        del a  # y_stem stays in HBM; the kernel DMAs chunks in at slot 0
        return pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    args: List = [y_stem.reshape(n * h0 * h0, c)]
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

    # the output stays in HBM: heads are DMAed out chunk-by-chunk from a
    # small staging buffer (see _model_buf_kernel.dma_head). Layout
    # (n, K, cls, h0*h0): minor dim 4096 is lane-aligned, cls=16 is
    # sublane-aligned; un-transposed after the call.
    out_shape = jax.ShapeDtypeStruct(
        (n, layer_num, class_num, h0 * h0), dtype)
    out_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    chunks = chunk_plan(bt, h0, num_blocks, layer_num=layer_num)

    # scratch: one channel-plane buffer per block position + intermedia
    res = [h0 // (2 ** j) for j in range(num_blocks + 1)]
    scratch = []
    for j in range(num_blocks):       # down
        scratch.append(pltpu.VMEM((bt * res[j] * res[j], c + order * g + g), dtype))
    scratch.append(pltpu.VMEM((bt * res[-1] * res[-1], c + order * g + g), dtype))
    for j in reversed(range(num_blocks)):   # up (traversal order nb-1..0)
        scratch.append(pltpu.VMEM((bt * res[j] * res[j], 2 * c + order * g + g), dtype))
    scratch.append(pltpu.VMEM((bt * h0 * h0, c + order * c), dtype))  # intermedia
    scratch.append(pltpu.VMEM((chunks[h0], class_num, h0 * h0), dtype))  # head stage
    scratch.append(pltpu.SemaphoreType.DMA)

    meta = dict(num_blocks=num_blocks, layer_num=layer_num, order=order,
                start=start, h=h0, bt=bt, chan=c, growth=g, dtype=dtype,
                bits_i=quant_bits_i, chunks=chunks)
    out = pl.pallas_call(
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
    return out.reshape(n, layer_num, class_num, h0, h0).transpose(0, 1, 3, 4, 2)
