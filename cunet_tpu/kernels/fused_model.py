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
            add(wset["w3"].astype(dtype))
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
