"""Pallas tera-kernel: the ENTIRE CU-Net forward in one launch (inference).

All K coupled U-Net slots run inside a single Pallas program per image:
the stem output enters once, every cross-slot FIFO and inter-block feature
lives purely in VMEM, and only the anchored heads' heatmaps leave to HBM.
Total weights for CU-Net-8 (~20 MB bf16) stay VMEM-resident across the
whole program. Kernel launches for the slot stack: 1 (vs ~80 for per-slot
giga-kernels, vs ~250 for the XLA path) — on a stack with ~0.3 ms per
launch this removes nearly all dispatch overhead.

Reuses the value-level stages of cunet_tpu.kernels.fused_hourglass.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cunet_tpu.kernels.fused_hourglass import (
    _block_stage,
    _bottleneck_val,
    _maxpool2,
    _upsample2,
    pack_w3,
)


def _model_kernel(meta, *refs):  # noqa: C901
    nb = meta["num_blocks"]
    K = meta["layer_num"]
    order = meta["order"]
    anchors = meta["anchors"]          # tuple of 1-indexed anchored slots
    h0 = meta["h"]
    dtype = meta["dtype"]

    it = iter(refs)
    nxt = lambda: next(it)

    y = nxt()[0]  # stem output (h0, w0, c)

    def read_wset(skip):
        wset = {"vec_b": nxt(), "w_b": nxt()[...], "vec2": nxt(),
                "w3": nxt()[...], "vec_a": nxt(), "w_a": nxt()[...]}
        if skip:
            wset["vec_s"] = nxt()
            wset["w_s"] = nxt()[...]
        return wset

    head_values: List = []
    # fifo state: python lists of VMEM values, per block position
    f_down: List[List] = [[] for _ in range(nb)]
    f_neck: List = []
    f_up: List[List] = [[] for _ in range(nb)]
    f_inter: List = []

    def push(fifo, val, i):
        if i < order:
            fifo.append(val)
        elif fifo:
            fifo.pop(0)
            fifo.append(val)

    for i in range(K):
        h = w = h0
        m = h * w
        # ---- intermedia ----
        if i == 0:
            if order > 0:
                f_inter.append(y)
        else:
            vec_p, w_p = nxt(), nxt()
            x_cat = jnp.concatenate(
                [y.reshape(m, -1)] + [f.reshape(m, -1) for f in f_inter], axis=-1
            )
            out = _bottleneck_val(x_cat, vec_p, w_p[...], dtype).astype(dtype)
            y = out.reshape(h, w, -1)
            push(f_inter, y, i)

        # ---- down path ----
        skips = []
        for j in range(nb):
            wset = read_wset(skip=True)
            x_cat = jnp.concatenate(
                [y.reshape(m, -1)] + [f.reshape(m * 1, -1) for f in f_down[j]],
                axis=-1,
            )
            ahead, skip, out32 = _block_stage(x_cat, wset, h, w, dtype)
            push(f_down[j], out32.reshape(h, w, -1), i)
            skips.append((skip, h))
            y = _maxpool2(ahead, h, w)
            h, w = h // 2, w // 2
            m = h * w
            y = y.reshape(h, w, -1)

        # ---- neck ----
        wset = read_wset(skip=False)
        x_cat = jnp.concatenate(
            [y.reshape(m, -1)] + [f.reshape(m, -1) for f in f_neck], axis=-1
        )
        ahead, _, out32 = _block_stage(x_cat, wset, h, w, dtype)
        push(f_neck, out32.reshape(h, w, -1), i)
        y = ahead.reshape(h, w, -1)

        # ---- up path ----
        for j in reversed(range(nb)):
            up = _upsample2(y, h, w)
            h, w = h * 2, w * 2
            m = h * w
            skip_val, _ = skips[j]
            wset = read_wset(skip=False)
            x_cat = jnp.concatenate(
                [up, skip_val.reshape(m, -1)]
                + [f.reshape(m, -1) for f in f_up[j]],
                axis=-1,
            )
            ahead, _, out32 = _block_stage(x_cat, wset, h, w, dtype)
            push(f_up[j], out32.reshape(h, w, -1), i)
            y = ahead.reshape(h, w, -1)

        # ---- head (anchored slots only); writes deferred: output refs
        # follow ALL input refs in the pallas calling convention ----
        if (i + 1) in anchors:
            vec_h, w_h = nxt(), nxt()
            hm = _bottleneck_val(y.reshape(m, -1), vec_h, w_h[...], dtype)
            head_values.append(hm.astype(dtype).reshape(h, w, -1))

    for hm in head_values:
        out_ref = nxt()
        out_ref[0] = hm


def fused_model_infer(
    y_stem: jnp.ndarray,
    slot_args: Sequence[Dict],
    *,
    num_blocks: int,
    layer_num: int,
    order: int,
    anchors: Sequence[int],
    class_num: int,
    interpret: bool = False,
):
    """One-launch full forward from the stem output.

    ``slot_args[i]`` holds, for slot i: ``inter`` = (vec, w) or None (i=0),
    ``blocks`` = list of wset dicts in traversal order (down0..nb-1, neck,
    up nb-1..0), ``head`` = (vec, w) or None (unanchored).
    Returns a tuple of anchored head heatmaps (N, h0, h0, class_num).
    """
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    n, h0 = y_stem.shape[0], y_stem.shape[1]
    dtype = y_stem.dtype

    def xspec(a):
        return pl.BlockSpec((1,) + a.shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    args: List = [y_stem]
    specs: List = [xspec(y_stem)]

    def add(a):
        args.append(a)
        specs.append(full(a))

    # interleave refs exactly as the kernel consumes them, with outputs
    # declared in anchored-slot order
    n_outputs = 0
    for i, sa in enumerate(slot_args):
        if i > 0:
            vec, w = sa["inter"]
            add(vec.astype(jnp.float32))
            add(w[0, 0].astype(dtype))
        for wset in sa["blocks"]:
            add(wset["vec_b"].astype(jnp.float32))
            add(wset["w_b"][0, 0].astype(dtype) if wset["w_b"].ndim == 4
                else wset["w_b"].astype(dtype))
            add(wset["vec2"].astype(jnp.float32))
            add(pack_w3(wset["w3"]).astype(dtype))
            add(wset["vec_a"].astype(jnp.float32))
            add(wset["w_a"][0, 0].astype(dtype) if wset["w_a"].ndim == 4
                else wset["w_a"].astype(dtype))
            if "w_s" in wset:
                add(wset["vec_s"].astype(jnp.float32))
                add(wset["w_s"][0, 0].astype(dtype) if wset["w_s"].ndim == 4
                    else wset["w_s"].astype(dtype))
        if sa["head"] is not None:
            vec, w = sa["head"]
            add(vec.astype(jnp.float32))
            add(w[0, 0].astype(dtype))
            n_outputs += 1

    out_shapes = tuple(
        jax.ShapeDtypeStruct((n, h0, h0, class_num), dtype)
        for _ in range(n_outputs)
    )

    def ospec(sh):
        return pl.BlockSpec((1,) + tuple(sh.shape[1:]), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    meta = dict(num_blocks=num_blocks, layer_num=layer_num, order=order,
                anchors=tuple(anchors), h=h0, dtype=dtype)
    outs = pl.pallas_call(
        functools.partial(_model_kernel, meta),
        grid=(n,),
        in_specs=specs,
        out_specs=tuple(ospec(sh) for sh in out_shapes),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return outs


# ---------------------------------------------------------------------------
# loop variant: fori_loop over stacked steady-state slot weights
# ---------------------------------------------------------------------------
#
# The unrolled kernel above Mosaic-compiles every slot body (~11 min for
# K=8). Steady-state slots (i >= order) share shapes, so their weights stack
# on a leading axis and ONE loop body serves them all: compile time drops to
# roughly (order+1) slot bodies. Heads are computed for every slot into one
# stacked output; anchor selection happens outside.


def _read_wset_vals(nxt, skip):
    """Load one block's weights fully (for the unrolled prefix slots)."""
    w = {"vec_b": nxt()[...], "w_b": nxt()[...], "vec2": nxt()[...],
         "w3": nxt()[...], "vec_a": nxt()[...], "w_a": nxt()[...]}
    if skip:
        w["vec_s"] = nxt()[...]
        w["w_s"] = nxt()[...]
    return w


def _model_loop_kernel(meta, *refs):  # noqa: C901
    nb = meta["num_blocks"]
    K = meta["layer_num"]
    order = meta["order"]
    start = meta["start"]              # = max(order, 1); slots < start unrolled
    h0 = meta["h"]
    bt = meta["bt"]                    # images per grid step (batch tile)
    dtype = meta["dtype"]

    it = iter(refs)
    nxt = lambda: next(it)

    # all activations flow flat as (bt*h*w, C); spatial ops take (bt, h, w)
    y = nxt()[...].reshape(bt * h0 * h0, -1)

    f_down = [[] for _ in range(nb)]
    f_neck: list = []
    f_up = [[] for _ in range(nb)]
    f_inter: list = []

    def run_slot(y, i, get_wset, get_inter, get_head, fifo_state):
        f_down, f_neck, f_up, f_inter = fifo_state
        h = w = h0
        if i == 0:
            if order > 0:
                f_inter = f_inter + [y]
        else:
            vec_p, w_p = get_inter()
            x_cat = jnp.concatenate([y] + list(f_inter), axis=-1)
            y = _bottleneck_val(x_cat, vec_p, w_p, dtype).astype(dtype)
            f_inter = _push_l(f_inter, y, i, order)
        skips = []
        nf_down = list(f_down)
        for j in range(nb):
            wset = get_wset(j, True)
            x_cat = jnp.concatenate([y] + list(nf_down[j]), axis=-1)
            ahead, skip, out32 = _block_stage(x_cat, wset, h, w, dtype, bt)
            nf_down[j] = _push_l(nf_down[j], out32, i, order)
            skips.append(skip)
            y = _maxpool2(ahead, h, w, bt)
            h, w = h // 2, w // 2
        wset = get_wset(nb, False)
        x_cat = jnp.concatenate([y] + list(f_neck), axis=-1)
        ahead, _, out32 = _block_stage(x_cat, wset, h, w, dtype, bt)
        nf_neck = _push_l(f_neck, out32, i, order)
        y = ahead
        nf_up = list(f_up)
        for idx, j in enumerate(reversed(range(nb))):
            up = _upsample2(y, h, w, bt)
            h, w = h * 2, w * 2
            wset = get_wset(nb + 1 + idx, False)
            x_cat = jnp.concatenate(
                [up, skips[j]] + list(nf_up[j]), axis=-1
            )
            ahead, _, out32 = _block_stage(x_cat, wset, h, w, dtype, bt)
            nf_up[j] = _push_l(nf_up[j], out32, i, order)
            y = ahead
        vec_h, w_h = get_head()
        hm = _bottleneck_val(y, vec_h, w_h, dtype).astype(dtype)
        return y, hm.reshape(bt, h, w, -1), (nf_down, nf_neck, nf_up, f_inter)

    # ---- unrolled prefix slots: per-slot refs ----
    prefix_heads = []
    for i in range(start):
        inter_vals = None
        if i > 0:
            inter_vals = (nxt()[...], nxt()[...])
        wsets = [_read_wset_vals(nxt, j < nb) for j in range(2 * nb + 1)]
        head_vals = (nxt()[...], nxt()[...])
        y, hm, (f_down, f_neck, f_up, f_inter) = run_slot(
            y, i,
            get_wset=lambda pos, skip, w=wsets: w[pos],
            get_inter=lambda v=inter_vals: v,
            get_head=lambda v=head_vals: v,
            fifo_state=(f_down, f_neck, f_up, f_inter),
        )
        prefix_heads.append(hm)

    # ---- steady-state slots: stacked refs + fori_loop ----
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

    out_ref = nxt()  # (bt, K, h0, h0, class)
    for i, hm in enumerate(prefix_heads):
        out_ref[:, i] = hm

    if S > 0:
        carry0 = (
            y,
            tuple(tuple(f) for f in f_down),
            tuple(f_neck),
            tuple(tuple(f) for f in f_up),
            tuple(f_inter),
        )

        def body(r, carry):
            y, cd, cn, cu, ci = carry
            fifo_state = ([list(f) for f in cd], list(cn),
                          [list(f) for f in cu], list(ci))
            y, hm, (nd, nn, nu, ni) = run_slot(
                y, max(order, 1),  # steady state: pop+push, intermedia active
                get_wset=lambda pos, skip, r=r: {
                    k: v[r] for k, v in block_stacks[pos].items()
                },
                get_inter=lambda r=r: (inter_stack[0][r], inter_stack[1][r]),
                get_head=lambda r=r: (head_stack[0][r], head_stack[1][r]),
                fifo_state=fifo_state,
            )
            out_ref[:, start + r] = hm
            return (y, tuple(tuple(f) for f in nd), tuple(nn),
                    tuple(tuple(f) for f in nu), tuple(ni))

        # unroll=2 halves loop-management overhead at ~2x body compile cost
        _unroll = int(os.environ.get("CUNET_TERA_UNROLL", "2"))
        jax.lax.fori_loop(0, S, body, carry0,
                          unroll=_unroll if S % max(_unroll, 1) == 0 else 1)


def _push_l(fifo, val, i, order):
    if i < order:
        return fifo + [val]
    if fifo:
        return fifo[1:] + [val]
    return fifo


def default_batch_tile(n: int, h0: int, layer_num: int) -> int:
    """Images per grid step. Batch tiling multiplies the M dimension of every
    MXU matmul in the kernel (the deep 8x8/4x4 stages are M-starved per
    image) at the cost of VMEM for the tile's activations. 4 at 64x64 stem
    resolution measures fastest on v5e; override with CUNET_TERA_BATCH_TILE."""
    env = os.environ.get("CUNET_TERA_BATCH_TILE")
    if env:
        bt = int(env)
        if n % bt:
            raise ValueError(f"batch {n} not divisible by batch tile {bt}")
        return bt
    if layer_num > 8 and h0 >= 64:
        # K=16 keeps ~2x the resident weights, so its tile budget is lower
        # than K=8's. bt4 fits since the heads/stem moved to HBM DMA and the
        # dycol conv shrank the high-res transients; r5 sweep: 1969.6 img/s
        # at bt4 vs 1935.8 at bt8 vs 1937.6 at the old bt2 default
        for cand in (4, 2):
            if n % cand == 0:
                return cand
        return 1
    # bt=8 fits v5e since the out heads + stem moved to HBM DMA and the
    # high-res stages chunk to CUNET_TERA_CHUNK_ROWS (fused_model_buf):
    # measured 3005 img/s at bt8 vs 2804 at bt2 (K=8 @256)
    budget = 8
    bt = 1
    for cand in (2, 4, 8):
        if cand <= budget and n % cand == 0:
            bt = cand
    return bt


def fused_model_loop_infer(
    y_stem: jnp.ndarray,
    slot_args: Sequence[Dict],
    *,
    num_blocks: int,
    layer_num: int,
    order: int,
    class_num: int,
    batch_tile: int = 0,
    interpret: bool = False,
):
    """Loop-variant one-launch full forward: steady-state slots run under an
    in-kernel fori_loop over stacked weights (compile time ~ (order+1) slot
    bodies instead of K). Heads are computed for EVERY slot; returns a single
    stacked array (N, K, h0, h0, class_num) — select anchors outside.

    ``batch_tile`` images are processed together per grid step (0 = auto),
    multiplying every matmul's M dimension. Requires ``slot_args[i]["head"]``
    for all slots (params always carry all K heads).
    """
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    n, h0 = y_stem.shape[0], y_stem.shape[1]
    dtype = y_stem.dtype
    start = max(order, 1)
    S = layer_num - start
    # this legacy impl keeps the whole (bt, K, h0, h0, cls) output
    # VMEM-windowed, so it cannot take the large tiles the buf impl's HBM
    # head DMA enables — cap at the round-2-safe tiles
    safe = 1 if (layer_num > 8 and h0 >= 64) else 2
    bt = batch_tile or min(safe, default_batch_tile(n, h0, layer_num))

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
        return w[0, 0].astype(dtype) if w.ndim == 4 else w.astype(dtype)

    def add_wset(wset):
        add(wset["vec_b"].astype(jnp.float32))
        add(conv2d_mat(wset["w_b"]))
        add(wset["vec2"].astype(jnp.float32))
        add(pack_w3(wset["w3"]).astype(dtype))
        add(wset["vec_a"].astype(jnp.float32))
        add(conv2d_mat(wset["w_a"]))
        if "w_s" in wset:
            add(wset["vec_s"].astype(jnp.float32))
            add(conv2d_mat(wset["w_s"]))

    # unrolled prefix slots
    for i in range(start):
        sa = slot_args[i]
        if i > 0:
            vec, w = sa["inter"]
            add(vec.astype(jnp.float32))
            add(conv2d_mat(w))
        for wset in sa["blocks"]:
            add_wset(wset)
        vec, w = sa["head"]
        add(vec.astype(jnp.float32))
        add(conv2d_mat(w))

    # stacked steady-state refs
    if S > 0:
        steady = slot_args[start:]
        add(jnp.stack([sa["inter"][0] for sa in steady]).astype(jnp.float32))
        add(jnp.stack([conv2d_mat(sa["inter"][1]) for sa in steady]))
        for pos in range(2 * num_blocks + 1):
            keys = ["vec_b", "w_b", "vec2", "w3", "vec_a", "w_a"]
            if pos < num_blocks:
                keys += ["vec_s", "w_s"]
            for k in keys:
                if k.startswith("vec"):
                    add(jnp.stack([sa["blocks"][pos][k] for sa in steady]).astype(jnp.float32))
                elif k == "w3":
                    add(jnp.stack([pack_w3(sa["blocks"][pos][k])
                                   for sa in steady]).astype(dtype))
                else:
                    add(jnp.stack([conv2d_mat(sa["blocks"][pos][k]) for sa in steady]))
        add(jnp.stack([sa["head"][0] for sa in steady]).astype(jnp.float32))
        add(jnp.stack([conv2d_mat(sa["head"][1]) for sa in steady]))

    out_shape = jax.ShapeDtypeStruct((n, layer_num, h0, h0, class_num), dtype)
    out_spec = pl.BlockSpec((bt, layer_num, h0, h0, class_num),
                            lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM)

    meta = dict(num_blocks=num_blocks, layer_num=layer_num, order=order,
                start=start, h=h0, bt=bt, dtype=dtype)
    return pl.pallas_call(
        functools.partial(_model_loop_kernel, meta),
        grid=(n // bt,),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
