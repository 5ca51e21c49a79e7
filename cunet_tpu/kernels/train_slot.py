"""Pallas TRAIN kernels: one launch per U-Net slot, forward AND backward.

The train step was measured op-count-bound on TPU (see PARITY.md round-2
training study): the lax path spends ~80% of its time in thousands of tiny
BN/elementwise/dynamic-slice ops, not in matmuls. These kernels run an
ENTIRE coupled-U-Net slot — intermedia adapter, 4 down blocks (with pools),
neck, 4 up blocks (with upsamples), head — as ONE Pallas program for the
forward and TWO for the backward (head+up path, then neck+down+intermedia;
one whole-slot backward exceeds v5e's 128 MB VMEM), with train-mode
batch-norm statistics computed in VMEM.

Batch statistics are per grid tile (``bn_tile`` images): ghost/per-replica
BN, matching how the reference's DataParallel training NORMALIZES — every
BN layer uses its GPU shard's statistics (ref:cu-net.py:59,
models/cu_net_prev_version.py:607-637). Running-stat persistence
deliberately differs: torch DataParallel keeps replica 0's running buffers
only, while here they update with the tile-averaged mean / unbiased
variance (see ops.layers.batch_norm). The lax oracle is
``apply_cu_net`` with ``cfg.bn_tile = bt`` and ``bn_dtype="compute"``,
asserted in tests/test_train_slot.py.

Backward strategy (the TPU counterpart of the reference's shared-storage
recompute, ref:models/cu_net_prev_version.py:520-599): the forward saves
only each block's INPUT (pooled/upsampled activations + skips — the same
quantities the reference's shared storages hold), the per-tile BN stats,
and the cross-slot FIFO outputs. The backward walks the slot in reverse,
recomputing each block's internals from its saved input, so activation
residuals stay O(block), not O(slot). Weight gradients accumulate in fp32
across grid steps (the TPU grid is sequential).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cunet_tpu.kernels.fused_hourglass import (
    _conv3x3,
    _maxpool2,
    _upsample2,
)
from cunet_tpu.ops import dropmask
from cunet_tpu.ops.layers import BN_EPS

# ---------------------------------------------------------------------------
# shared geometry
# ---------------------------------------------------------------------------


def slot_plan(num_blocks: int, h0: int, c: int, g: int, L: int):
    """Per-position dicts in traversal order (down 0..nb-1, neck, up nb-1..0).

    L = FIFO entry count for this slot (= min(slot_i, order)).
    """
    plan = []
    res = h0
    for _ in range(num_blocks):
        plan.append(dict(res=res, base=c, skip=True, k1=c + L * g))
        res //= 2
    plan.append(dict(res=res, base=c, skip=False, k1=c + L * g))
    for _ in range(num_blocks):
        res *= 2
        plan.append(dict(res=res, base=2 * c, skip=False, k1=2 * c + L * g))
    for p in plan:
        p["k2"] = p["k1"] + g
    return plan


def saved_layout(plan, nb: int, c: int):
    """(res, chan) of the forward's saved block inputs, in emission order:
    pooled inputs (down 1..nb-1 + neck), up-block pre-upsample inputs,
    skips."""
    pooled = [(plan[j + 1]["res"], c) for j in range(nb)]
    up_pre = [(plan[nb + 1 + i]["res"] // 2, c) for i in range(nb)]
    skips = [(plan[j]["res"], c) for j in range(nb)]
    return pooled, up_pre, skips


def _read_wset(nxt, skip):
    w = {"bn1": nxt()[...], "w_b": nxt()[...], "bn2": nxt()[...],
         "w3": nxt()[...], "bn_a": nxt()[...], "w_a": nxt()[...]}
    if skip:
        w["bn_s"] = nxt()[...]
        w["w_s"] = nxt()[...]
    return w


def make_meta(cfg, slot_i: int, bt: int, bits_i: int = 0,
              drop=False, drop_rate: float = 0.0) -> Dict:
    """Static kernel metadata for slot ``slot_i`` (None = steady state).
    ``drop`` selects the dense-layer dropout source (the reference trains
    with optional dropout while keeping its memory-efficient runtime,
    ref:models/cu_net.py:63-64):
      False    — no dropout
      "masks"  — precomputed scaled masks threaded as extra per-position
                 kernel inputs (True normalizes to this, r4 back-compat)
      "seed"   — IN-KERNEL counter-hash masks (ops/dropmask.py) from one
                 int32 seed input; the recompute-backward kernels
                 regenerate identical bits (needs ``drop_rate``)"""
    L = cfg.order if slot_i is None else min(slot_i, cfg.order)
    has_inter = slot_i is None or slot_i > 0
    return dict(
        num_blocks=cfg.num_blocks,
        L=L,
        has_inter=has_inter,
        bt=bt,
        chan=cfg.init_chan_num,
        growth=cfg.growth_rate,
        cb=cfg.bottleneck_chan,
        dtype=jnp.dtype(cfg.compute_dtype),
        eps=BN_EPS,
        bits_i=bits_i,
        drop="masks" if drop is True else drop,
        drop_rate=drop_rate,
    )


def finalize_meta(meta: Dict, h0: int) -> Dict:
    meta = dict(meta, h=h0)
    meta["plan"] = slot_plan(meta["num_blocks"], h0, meta["chan"],
                             meta["growth"], meta["L"])
    return meta


def _bn_vec(norm_params):
    return jnp.stack([norm_params["scale"], norm_params["bias"]])


def marshal_slot(p_slot, num_blocks: int) -> Dict:
    """Kernel weight dict from a ``_slot_subtree`` params view. All ops here
    are differentiable glue (stack/slice/pack), so grads flow back to the
    original param pytree through the custom-VJP'd kernel call."""
    from cunet_tpu.kernels.fused_hourglass import (pack_w3_dycol,
                                                   pack_w3_scatter)

    pack = pack_w3_dycol if _TRAIN_CONV_MODE == "dycol" else pack_w3_scatter

    def wset(bp):
        d = {
            "bn1": _bn_vec(bp["layers"]["bottleneck"]["norm"]),
            "w_b": bp["layers"]["bottleneck"]["conv"][0, 0],
            "bn2": _bn_vec(bp["layers"]["norm2"]),
            "w3": pack(bp["layers"]["conv2"]),
            "bn_a": _bn_vec(bp["adapters_ahead"]["norm"]),
            "w_a": bp["adapters_ahead"]["conv"][0, 0],
        }
        if "adapters_skip" in bp:
            d["bn_s"] = _bn_vec(bp["adapters_skip"]["norm"])
            d["w_s"] = bp["adapters_skip"]["conv"][0, 0]
        return d

    hg = p_slot["hg"]
    blocks = (
        [wset(hg["down"][j]) for j in range(num_blocks)]
        + [wset(hg["neck"])]
        + [wset(hg["up"][j]) for j in reversed(range(num_blocks))]
    )
    W = {"blocks": blocks,
         "head": (_bn_vec(p_slot["head"]["norm"]), p_slot["head"]["conv"][0, 0])}
    if "inter" in p_slot and p_slot["inter"] is not None:
        W["inter"] = (_bn_vec(p_slot["inter"]["norm"]),
                      p_slot["inter"]["conv"][0, 0])
    return W


def _dot(a, b, dtype):
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stats(x):
    """Per-tile biased batch stats of a (m, C) value, fp32."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=0)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=0)
    return mu, var


def _norm_relu(x, bn, mu, var, dtype, eps):
    """relu(batchnorm(x)) with given stats, normalize in compute dtype
    (bn_dtype="compute" semantics: z = x*inv + shift)."""
    inv = jax.lax.rsqrt(var + eps) * bn[0]
    shift = bn[1] - mu * inv
    return jnp.maximum(
        x.astype(dtype) * inv.astype(dtype) + shift.astype(dtype), 0
    )


def _quan(x, bits_i: int):
    """In-kernel QuanInput forward: Q(C(x, bits_i), bits_i)
    (ref:utils/quantize.py:47-63). ``bits_i == 0`` or > 15 means no
    activation quantization (the reference inserts QuanInput2d only when
    bits_i <= 15, ref:models/cu_net_prev_version_wig.py:96-100).

    Computed in f32 (Mosaic rejects sub-32-bit compares — jnp.sign lowers
    to a bf16 cmpf otherwise) and cast back. This is BIT-IDENTICAL to the
    lax path's bf16 arithmetic: the clip bounds (1 - 2^-(b-1)), the
    power-of-two scaling x*S and /S, the +0.5, and floor are all exact in
    bf16 for |x| <= 1 with b <= 8 (integers through 255 carry 8 significand
    bits), so neither precision ever rounds."""
    if not bits_i or bits_i > 15:
        return x
    from cunet_tpu.quant.wage import clip_c, quant_q

    return quant_q(clip_c(x.astype(jnp.float32), bits_i),
                   bits_i).astype(x.dtype)


def _ste_mask(d, x):
    """QuanInput backward: pass the cotangent through except where
    |x| >= 1 (straight-through estimator, ref:utils/quantize.py:58-62).
    fp32 compares (Mosaic rejects sub-32-bit predication here)."""
    x32 = x.astype(jnp.float32)
    return jnp.where((x32 > -1.0) & (x32 < 1.0), d, 0.0)


def _seed_mask(meta, seed, pos: int, hh: int):
    """In-kernel scaled dropout mask for traversal position ``pos`` at
    resolution ``hh`` (drop == "seed"). The mask depends only on
    (seed, pos, grid step, element index), so the fwd kernel and both
    backward kernels regenerate identical bits with no saved state."""
    return dropmask.tile_mask(
        seed, pos, pl.program_id(0), meta["bt"] * hh * hh, meta["growth"],
        meta["drop_rate"], meta["dtype"])


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _slot_fwd_kernel(meta, *refs):  # noqa: C901
    nb = meta["num_blocks"]
    L = meta["L"]
    has_inter = meta["has_inter"]
    h0 = meta["h"]
    bt = meta["bt"]
    dtype = meta["dtype"]
    eps = meta["eps"]

    it = iter(refs)
    nxt = lambda: next(it)

    def flat(ref):
        v = ref[...]
        return v.reshape(bt * v.shape[1] * v.shape[2], v.shape[3])

    seed = nxt()[0] if meta.get("drop") == "seed" else None
    y = flat(nxt())  # (bt*h0*h0, c)

    stat_writes: List = []

    def stage(x_cat, bn, w):
        mu, var = _stats(x_cat)
        stat_writes.append(jnp.stack([mu, var]))
        z = _norm_relu(x_cat, bn, mu, var, dtype, eps)
        return _dot(z, w, dtype)

# NOTE (r5, measured NEGATIVE): composing x_cat/x2 stats from per-part
# stats (exact — channels are independent; ups parts could reuse producer
# low-res stats since row duplication changes neither mean nor variance)
# measured 473-483 img/s vs the 488 monolithic baseline: Mosaic fuses the
# full-width reduction into the surrounding passes better than it schedules
# the per-part reduction trees + (1, C) stat concats, and the composition
# ADDED ~4M VMEM at bn_tile=4 (138.89M vs 134.53M). Reverted to the
# monolithic per-stage _stats; see PARITY.md r5 training section.

    # ---- intermedia ----
    inter_out_val = None
    if has_inter:
        inter_fifo = [flat(nxt()) for _ in range(L)]
        bn_i, w_i = nxt()[...], nxt()[...]
        x_cat = jnp.concatenate([y] + inter_fifo, axis=-1)
        y = stage(x_cat, bn_i, w_i).astype(dtype)
        inter_out_val = y

    def block(x_parts, fifo_vals, wset, h, w, mask=None):
        x_cat = _cat_canon(list(x_parts) + list(fifo_vals))
        yb = stage(x_cat, wset["bn1"], wset["w_b"]).astype(dtype)
        mu2, var2 = _stats(yb)
        stat_writes.append(jnp.stack([mu2, var2]))
        z2 = _norm_relu(yb, wset["bn2"], mu2, var2, dtype, eps)
        # WIG insertion point No.1: quantize activations between the ReLU
        # and the 3x3 conv (ref:models/cu_net_prev_version_wig.py:96-100)
        z2 = _quan(z2, meta["bits_i"])
        out32 = _conv3x3_t(z2, wset["w3"], bt, h, w).astype(dtype)
        if mask is not None:
            # dense-layer dropout: precomputed scaled mask {0, 1/keep}
            # applied to the 3x3 conv output (ref:models/cu_net.py:63-64)
            out32 = out32 * mask
        x2 = jnp.concatenate([x_cat, out32], axis=-1)
        ahead = stage(x2, wset["bn_a"], wset["w_a"]).astype(dtype)
        skip = None
        if "bn_s" in wset:
            skip = stage(x2, wset["bn_s"], wset["w_s"]).astype(dtype)
        return ahead, skip, out32

    # ---- traversal ----
    out32_vals: List = []
    skips: List = []
    pooled_vals: List = []   # inputs of down 1..nb-1 and the neck
    up_pre_vals: List = []   # inputs of up blocks, pre-upsample
    drop = meta.get("drop", False)
    _mask_pos = [0]

    def rd_mask(hh):
        pos, _mask_pos[0] = _mask_pos[0], _mask_pos[0] + 1
        if not drop:
            return None
        if drop == "seed":
            return _seed_mask(meta, seed, pos, hh)
        return flat(nxt())

    h = w = h0
    for j in range(nb):
        fifo = [flat(nxt()) for _ in range(L)]
        wset = _read_wset(nxt, True)
        ahead, skip, o32 = block([y], fifo, wset, h, w, rd_mask(h))
        out32_vals.append((o32, h))
        skips.append((skip, h))
        y = _maxpool2(ahead, h, w, bt)
        h, w = h // 2, w // 2
        pooled_vals.append((y, h))
    fifo = [flat(nxt()) for _ in range(L)]
    wset = _read_wset(nxt, False)
    ahead, _, o32 = block([y], fifo, wset, h, w, rd_mask(h))
    out32_vals.append((o32, h))
    y = ahead
    for idx, j in enumerate(reversed(range(nb))):
        up_pre_vals.append((y, h))
        up = _upsample2(y, h, w, bt)
        h, w = h * 2, w * 2
        fifo = [flat(nxt()) for _ in range(L)]
        wset = _read_wset(nxt, False)
        ahead, _, o32 = block([up, skips[j][0]], fifo, wset, h, w,
                              rd_mask(h))
        out32_vals.append((o32, h))
        y = ahead

    # ---- head ----
    bn_h, w_h = nxt()[...], nxt()[...]
    mu_h, var_h = _stats(y)
    stat_writes.append(jnp.stack([mu_h, var_h]))
    z_h = _norm_relu(y, bn_h, mu_h, var_h, dtype, eps)
    # WIG insertion point No.2: the head 1x1 conv's input
    # (ref:models/cu_net_prev_version_wig.py:277-281)
    z_h = _quan(z_h, meta["bits_i"])
    hm = _dot(z_h, w_h, dtype).astype(dtype)

    # ---- outputs ----
    def write(ref, val, hh):
        ref[...] = val.reshape(bt, hh, hh, -1)

    write(nxt(), y, h0)                        # y_out
    write(nxt(), hm, h0)                       # head
    if has_inter:
        write(nxt(), inter_out_val, h0)        # inter_out
    for o32, hh in out32_vals:
        write(nxt(), o32, hh)
    for pv, hh in pooled_vals:
        write(nxt(), pv, hh)
    for uv, hh in up_pre_vals:
        write(nxt(), uv, hh)
    for sv, hh in skips:
        write(nxt(), sv, hh)
    for sw in stat_writes:
        nxt()[0] = sw                          # (1, 2, C) tile block


def _marshal_inputs(meta, y, inter_fifo, fifos, W, masks=None):
    """Argument list + in_specs shared by the fwd and bwd pallas calls.
    ``masks`` = per-position scaled dropout masks (drop == "masks") or the
    (1,) int32 seed array (drop == "seed", marshaled FIRST into SMEM)."""
    nb = meta["num_blocks"]
    L = meta["L"]
    has_inter = meta["has_inter"]
    bt = meta["bt"]
    dtype = meta["dtype"]
    plan = meta["plan"]

    def xspec(a):
        return pl.BlockSpec((bt,) + a.shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    args: List = []
    specs: List = []
    if meta.get("drop") == "seed":
        args.append(masks[0])
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(y.astype(dtype))
    specs.append(xspec(y))

    def add(a, spec):
        args.append(a)
        specs.append(spec(a))

    if has_inter:
        for f in inter_fifo:
            add(f.astype(dtype), xspec)
        bn, wgt = W["inter"]
        add(bn.astype(jnp.float32), full)
        add(wgt.astype(dtype), full)
    for pos, p in enumerate(plan):
        for f in fifos[pos]:
            add(f.astype(dtype), xspec)
        wset = W["blocks"][pos]
        for k in ("bn1", "w_b", "bn2", "w3", "bn_a", "w_a") + (
            ("bn_s", "w_s") if p["skip"] else ()
        ):
            a = wset[k]
            add(a.astype(jnp.float32 if k.startswith("bn") else dtype), full)
        if meta.get("drop") == "masks":
            add(masks[pos].astype(dtype), xspec)
    bn, wgt = W["head"]
    add(bn.astype(jnp.float32), full)
    add(wgt.astype(dtype), full)
    return args, specs


def _stat_widths(meta, W):
    """Per-tile stat channel widths in kernel emission order."""
    plan = meta["plan"]
    cb = meta["cb"]
    widths = []
    if meta["has_inter"]:
        widths.append(W["inter"][0].shape[-1])
    for p in plan:
        widths.append(p["k1"])
        widths.append(cb)
        widths.append(p["k2"])
        if p["skip"]:
            widths.append(p["k2"])
    widths.append(W["head"][0].shape[-1])
    return widths


def slot_train_fwd(
    y: jnp.ndarray,
    inter_fifo: Sequence[jnp.ndarray],
    fifos: Sequence[Sequence[jnp.ndarray]],
    W: Dict,
    *,
    meta: Dict,
    interpret: bool = False,
    masks=None,
):
    """One-launch train forward for a slot.

    Returns (y_out, head, inter_out|None, out32s, saved) where ``saved`` =
    dict(pooled=[...], up_pre=[...], skips=[...], stats=[...(T,2,C) f32]).
    """
    nb = meta["num_blocks"]
    h0 = meta["h"]
    bt = meta["bt"]
    c = meta["chan"]
    g = meta["growth"]
    dtype = meta["dtype"]
    plan = meta["plan"]
    n = y.shape[0]
    T = n // bt
    cls = W["head"][1].shape[-1]

    args, specs = _marshal_inputs(meta, y, inter_fifo, fifos, W, masks)

    out_shapes: List = []
    out_specs: List = []

    def out(hh, ch):
        out_shapes.append(jax.ShapeDtypeStruct((n, hh, hh, ch), dtype))
        out_specs.append(
            pl.BlockSpec((bt, hh, hh, ch), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    def out_stat(ch):
        out_shapes.append(jax.ShapeDtypeStruct((T, 2, ch), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 2, ch), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    out(h0, c)                          # y_out
    out(h0, cls)                        # head
    if meta["has_inter"]:
        out(h0, c)                      # inter_out
    for p in plan:
        out(p["res"], g)                # out32
    pooled_l, up_pre_l, skips_l = saved_layout(plan, nb, c)
    for hh, ch in pooled_l + up_pre_l + skips_l:
        out(hh, ch)
    widths = _stat_widths(meta, W)
    for ch in widths:
        out_stat(ch)

    outs = pl.pallas_call(
        functools.partial(_slot_fwd_kernel, meta),
        grid=(T,),
        in_specs=specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    outs = list(outs)
    y_out = outs.pop(0)
    head = outs.pop(0)
    inter_out = outs.pop(0) if meta["has_inter"] else None
    n_pos = len(plan)
    out32s = [outs.pop(0) for _ in range(n_pos)]
    saved = {
        "pooled": [outs.pop(0) for _ in range(nb)],
        "up_pre": [outs.pop(0) for _ in range(nb)],
        "skips": [outs.pop(0) for _ in range(nb)],
        "stats": [outs.pop(0) for _ in range(len(widths))],
    }
    assert not outs
    return y_out, head, inter_out, out32s, saved


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _dot_dx(d_out, w, dtype):
    """d_x of ``out = x @ w``: contract the output channel."""
    return jax.lax.dot_general(
        d_out.astype(dtype), w.astype(dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_dw(x, d_out, dtype):
    """dW of ``out = x @ w``: contract the rows."""
    return jax.lax.dot_general(
        x.astype(dtype), d_out.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _affine_bwd(x, bn, mu, var, d_z, dtype, eps, z=None):
    """Backward through ``z = relu(batchnorm_train(x))`` given d_z (fp32).

    Ghost BN: stats are functions of this tile's x, so the full batch-norm
    jacobian (mean-subtraction terms) applies within the tile.
    ``z`` (the forward's relu output, if already recomputed) supplies the
    relu mask directly — z = max(a, 0) in the compute dtype, so z > 0 is
    exactly a > 0 and the affine need not be re-evaluated.
    Returns (d_x fp32, d_bn (2,C) [d_gamma; d_beta] fp32).
    """
    inv = jax.lax.rsqrt(var + eps)
    ig = inv * bn[0]
    if z is None:
        shift = bn[1] - mu * ig
        z = jnp.maximum(
            x.astype(dtype) * ig.astype(dtype) + shift.astype(dtype), 0)
    d_a = jnp.where(z.astype(jnp.float32) > 0, d_z, 0.0)
    xh = (x.astype(jnp.float32) - mu) * inv
    d_beta = jnp.sum(d_a, axis=0)
    d_gamma = jnp.sum(d_a * xh, axis=0)
    # mean(d_xh) = gamma*d_beta/m and mean(d_xh*xh) = gamma*d_gamma/m with
    # d_xh = d_a*gamma — the classic 2-reduction BN backward; no extra
    # column reductions or d_xh materialization needed
    m = jnp.float32(x.shape[0])
    d_x = ig * (d_a - d_beta / m - xh * (d_gamma / m))
    return d_x, jnp.stack([d_gamma, d_beta])


def _stage_bwd(x, bn, w, mu, var, d_out, dtype, eps, bits_i=0):
    """Backward through ``out = relu(batchnorm(x)) @ w`` — with
    ``bits_i`` set, through ``out = quan(relu(batchnorm(x))) @ w`` (the
    head's WIG insertion point: dW against the quantized values, STE gate
    on the activation cotangent).

    Returns (d_x fp32, dW fp32, d_bn fp32)."""
    inv = jax.lax.rsqrt(var + eps)
    ig = inv * bn[0]
    shift = bn[1] - mu * ig
    z = jnp.maximum(x.astype(dtype) * ig.astype(dtype)
                    + shift.astype(dtype), 0)
    dW = _dot_dw(_quan(z, bits_i), d_out, dtype)
    d_z = _dot_dx(d_out, w, dtype)
    if bits_i and bits_i <= 15:
        d_z = _ste_mask(d_z, z)
    d_x, d_bn = _affine_bwd(x, bn, mu, var, d_z, dtype, eps, z=z)
    return d_x, dW, d_bn


_CONV_BWD_MODE = os.environ.get("CUNET_CONV_BWD", "catc")

# 3x3 conv form inside the TRAIN kernels (fwd + recompute backward).
# "dycol" (default, r5): 3 dy-dots on h-shifted slices — kills the scatter
# form's (m, 9G) tap transient fwd AND shrinks the backward's shifted-
# cotangent build from 9 canonicalized slices to 3 (see _conv3x3_bwd_dycol).
# "scatter" restores the r4 form (_CONV_BWD_MODE then applies).
_TRAIN_CONV_MODE = os.environ.get("CUNET_TRAIN_CONV3X3", "dycol")

# Row budget for the scatter-conv's tap transient inside the TRAIN kernels.
# The (rows, 9G) fp32 tap matrix (and its padded copy) is the kernels'
# largest live value: at bn_tile 4 and 64x64 it alone is ~19 MB x2, which is
# what pushed the whole-slot kernels past v5e's 128 MB VMEM at bn_tile > 2
# (PARITY.md round-2 record). Chunking the conv over image groups bounds
# the transient without touching BN semantics (stats are computed on the
# full tile; the 3x3 conv is per-image). Read at trace time so tests can
# monkeypatch it; its value is part of _make_slot_fn's cache key, so an
# override can never hit a stale traced kernel.
_TRAIN_CONV_CHUNK = int(os.environ.get("CUNET_TRAIN_CONV_CHUNK", "8192"))

# Dtype of part A's cross-launch cotangents (d_y_low + d_skips, emitted by
# the up launch and re-read by the down launch). "f32" (default) keeps them
# exact; "compute" halves their VMEM windows (~10.6 MB/launch at bn_tile=4
# — the margin that decides whether the bt4 backward fits the 128M budget)
# at ~0.4% bf16 rounding on those cotangents.
_TSBWD_DCOT = os.environ.get("CUNET_TSBWD_DCOT", "f32")


def _conv_chunk_imgs(bt: int, h: int, w: int) -> int:
    """Images per conv chunk: largest power-of-two divisor of ``bt`` whose
    row count stays within the transient budget."""
    ci = bt
    while ci > 1 and ci * h * w > _TRAIN_CONV_CHUNK:
        ci //= 2
    if bt % ci:
        raise ValueError(
            f"conv chunk {ci} does not divide batch tile {bt}; use a "
            "power-of-two bn_tile (the halving chain only yields divisors "
            "for those)")
    return ci


def _conv3x3_t(z2, w3, bt, h, w):
    """Train-kernel 3x3 conv forward, chunked over image groups (see
    _TRAIN_CONV_CHUNK). Numerically identical to the unchunked call — the
    conv never mixes images. The conv form follows the host-packed weight
    layout (_conv3x3 dispatches on ndim: 2 = scatter, 3 = dycol)."""
    ci = _conv_chunk_imgs(bt, h, w)
    if ci == bt:
        return _conv3x3(z2, w3, bt, h, w)
    m = ci * h * w
    parts = [_conv3x3(z2[u * m:(u + 1) * m], w3, ci, h, w)
             for u in range(bt // ci)]
    return jnp.concatenate(parts, axis=0)


def _canon2(sl):
    """Split-reconcat a shifted slice to force a canonical Mosaic layout
    (raw spatially-offset slices trip "offset mismatch on non-concat
    dimension" inside downstream concats)."""
    g2 = sl.shape[-1] // 2
    return jnp.concatenate([sl[:, :g2], sl[:, g2:]], axis=-1)


def _conv3x3_bwd_dycol(z2, w3, d_out32, bt, h, w, dtype):
    """Backward of the dycol-form 3x3 conv (host-packed (3, Cb, 3G) weight,
    fused_hourglass._conv3x3 plan B).

    Forward: S = sum_dy slice_dy(pad_h(z2)) @ W[dy]; out = dx-gather(S).
    Backward:
      d_S[:, :, :, dx*G:(dx+1)*G] = d_out shifted by (1 - dx) in w
        -> built from 3 canonicalized slices of the w-padded d_out
           (the scatter/catc build needs 9);
      dW[dy]  = slice_dy(pad_h(z2))^T @ d_S          (3 dots, K = m)
      d_z2    = sum_dy slice_{2-dy}(pad_h(d_S)) @ W[dy]^T
    The d_z2 shift rides the dot INPUT (shift commutes with the row-wise
    dot), so the accumulated terms are canonical dot outputs — shifting the
    outputs instead fails Mosaic lowering downstream (windowed-slice
    layouts in the BN-jacobian reductions). Same padded-tile MXU FLOPs as
    the catc fat dots (3x K=96->128 tiles vs 1x K=288->384); the epilogue
    drops from 9 shifted-slice builds to 3.
    Returns (d_z2 fp32 (m, Cb), dW3 fp32 (3, Cb, 3G))."""
    g = w3.shape[-1] // 3
    m = bt * h * w
    cb = z2.shape[-1]
    if os.environ.get("CUNET_DYCOL_BWD", "dycol") == "catc":
        # fallback: the proven catc backward on a scatter-packed weight
        # rebuilt in-kernel (dycol columns are dx-major within dy — exactly
        # scatter's tap-major order, so the rebuild is one lane concat);
        # dW comes out per-dy so the grad matches the (3, Cb, 3G) layout
        w3p = jnp.concatenate([w3[dy] for dy in range(3)], axis=-1)
        d_p2 = jnp.pad(d_out32.astype(dtype).reshape(bt, h, w, g),
                       ((0, 0), (1, 1), (1, 1), (0, 0)))
        d_t = jnp.concatenate(
            [_canon2(d_p2[:, 2 - dy:2 - dy + h, 2 - dx:2 - dx + w,
                          :].reshape(m, g))
             for dy in range(3) for dx in range(3)], axis=-1)
        dW = jnp.stack([_dot_dw(z2, d_t[:, dy * 3 * g:(dy + 1) * 3 * g],
                                dtype) for dy in range(3)])
        return _dot_dx(d_t, w3p, dtype), dW
    # canonicalize the cotangent: in-kernel it arrives as a lane-offset
    # slice of the adapter backward's d_x2 (offset k1 = 160/288 lanes),
    # and the w-shifted slice concat below fails Mosaic lowering on that
    # layout ("offset mismatch on non-concat dimension")
    d_out32 = _canon2(d_out32.astype(dtype))
    d_p = jnp.pad(d_out32.reshape(bt, h, w, g),
                  ((0, 0), (0, 0), (1, 1), (0, 0)))
    d_S = jnp.concatenate(
        [_canon2(d_p[:, :, 2 - dx:2 - dx + w, :].reshape(m, g))
         for dx in range(3)], axis=-1)
    zp = jnp.pad(z2.astype(dtype).reshape(bt, h, w, cb),
                 ((0, 0), (1, 1), (0, 0), (0, 0)))
    d_Sp = jnp.pad(d_S.astype(dtype).reshape(bt, h, w, 3 * g),
                   ((0, 0), (1, 1), (0, 0), (0, 0)))
    dW_parts = []
    d_z2 = None
    for dy in range(3):
        z_dy = zp[:, dy:dy + h].reshape(m, cb)
        dW_parts.append(_dot_dw(z_dy, d_S, dtype))
        # d_z2[y] += (d_S @ W[dy]^T)[y + 1 - dy] == (slice_{2-dy}(d_Sp)
        # @ W[dy]^T)[y] — whole-h0-row input shifts, sublane-aligned
        term = _dot_dx(d_Sp[:, 2 - dy:2 - dy + h].reshape(m, 3 * g),
                       w3[dy], dtype)
        d_z2 = term if d_z2 is None else d_z2 + term
    return d_z2, jnp.stack(dW_parts)


def _conv3x3_bwd(z2, w3p, d_out32, bt, h, w, dtype):
    """Backward of the train-kernel 3x3 conv; dispatches on the host-packed
    weight layout (3D = dycol, 2D = scatter forms below).

    Scatter form (host-packed (Cb, 9G) weight):

    The tap-d cotangent is d_out shifted by (1-dy, 1-dx) with zero borders.
    Default "catc" builds the (m, 9G) tap matrix by concatenating the 9
    shifted slices after canonicalizing each (split-reconcat on lanes) —
    Mosaic rejects the raw concat ("result/input offset mismatch on
    non-concat dimension") because the slices carry spatial offsets. Two
    fat dots then contract the full 9G dimension on the MXU. "taps" falls
    back to 9 thin per-tap dot pairs (K=G: ~4x lower MXU efficiency).
    Returns (d_z2 fp32 (m, Cb), dW3 fp32 matching the packed layout)."""
    if w3p.ndim == 3:
        return _conv3x3_bwd_dycol(z2, w3p, d_out32, bt, h, w, dtype)
    g = w3p.shape[-1] // 9
    m = bt * h * w
    d_p = jnp.pad(d_out32.astype(dtype).reshape(bt, h, w, g),
                  ((0, 0), (1, 1), (1, 1), (0, 0)))
    slices = [
        d_p[:, 2 - dy:2 - dy + h, 2 - dx:2 - dx + w, :].reshape(m, g)
        for dy in range(3) for dx in range(3)
    ]
    if _CONV_BWD_MODE == "catc":
        d_t = jnp.concatenate(
            [jnp.concatenate([sl[:, :g // 2], sl[:, g // 2:]], axis=-1)
             for sl in slices], axis=-1)
        return _dot_dx(d_t, w3p, dtype), _dot_dw(z2, d_t, dtype)
    if _CONV_BWD_MODE == "catc3":
        # dy-grouped build: 3 inner concats of 3 shifted slices + 1 outer
        # concat — 4 concat ops instead of 9 split-reconcat canonicalizations
        # + 1 concat. Compile-probe on-chip: multi-part concats of
        # spatially-shifted slices may still hit Mosaic's "offset mismatch
        # on non-concat dimension" (the reason catc canonicalizes per slice).
        d_t = jnp.concatenate(
            [jnp.concatenate(slices[3 * dy:3 * dy + 3], axis=-1)
             for dy in range(3)], axis=-1)
        return _dot_dx(d_t, w3p, dtype), _dot_dw(z2, d_t, dtype)
    d_z2 = None  # seed from the first tap dot — a zeros init gets a
    # replicated Mosaic layout that can hit "Invalid relayout" downstream
    dW3_parts = []
    for d, sl in enumerate(slices):
        term = _dot_dx(sl, w3p[:, d * g:(d + 1) * g], dtype)
        d_z2 = term if d_z2 is None else d_z2 + term
        dW3_parts.append(_dot_dw(z2, sl, dtype))
    return d_z2, jnp.concatenate(dW3_parts, axis=-1)


def _conv3x3_bwd_t(z2, w3p, d_out32, bt, h, w, dtype):
    """Chunked-over-images conv3x3 backward (see _TRAIN_CONV_CHUNK): the
    (rows, 9G) shifted-cotangent concat is the backward launches' largest
    transient. dW3 accumulates across chunks in fp32 (same accumulation
    dtype as the unchunked fat dot; summation grouping differs by chunk
    boundary only)."""
    ci = _conv_chunk_imgs(bt, h, w)
    if ci == bt:
        return _conv3x3_bwd(z2, w3p, d_out32, bt, h, w, dtype)
    m = ci * h * w
    d_z2_parts, dW3 = [], None
    for u in range(bt // ci):
        dz, dw = _conv3x3_bwd(z2[u * m:(u + 1) * m], w3p,
                              d_out32[u * m:(u + 1) * m], ci, h, w, dtype)
        d_z2_parts.append(dz)
        dW3 = dw if dW3 is None else dW3 + dw
    return jnp.concatenate(d_z2_parts, axis=0), dW3


def _upsample2_cat(x, h, w, bt):
    """Nearest 2x upsample via concatenation (materialized copies). The
    broadcast_to-based _upsample2 produces lane/sublane-replicated vectors
    that Mosaic cannot relayout into the backward kernel's transposed dots
    and concats; this version forces canonical layouts."""
    c = x.shape[-1]
    x4 = x.reshape(bt, h, w, c)
    xw = jnp.concatenate([x4[:, :, :, None, :], x4[:, :, :, None, :]],
                         axis=3).reshape(bt, h, 2 * w, c)
    xh = jnp.concatenate([xw[:, :, None, :, :], xw[:, :, None, :, :]],
                         axis=2).reshape(bt, 2 * h, 2 * w, c)
    return xh.reshape(bt * 2 * h * 2 * w, c)


def _pool_bwd(d_pooled, ahead, pooled, h, w, bt):
    """Backward of 2x2 maxpool: the full cotangent routes to exactly ONE
    window element — the first (row-major) quadrant achieving the window
    max, torch MaxPool2d / lax select_and_scatter semantics.

    The max is recomputed from ``ahead`` (the backward's own recompute)
    rather than compared against the forward kernel's saved ``pooled``:
    comparing values across two Mosaic programs risks a rounding-divergent
    recompute matching NO element (silently zeroing the window's gradient),
    and exact bf16 ties would double-count. Self-consistent max + first-
    winner masking eliminates both hazards. Quadrant-wise same-shape fp32
    compares — Mosaic rejects broadcast-shaped masks and bf16 equality."""
    del pooled  # forward-saved values are NOT compared against (see above)
    c = ahead.shape[-1]
    h2, w2 = h // 2, w // 2
    a6 = ahead.astype(jnp.float32).reshape(bt, h2, 2, w2, 2, c)
    quads = [a6[:, :, i, :, j, :] for i in range(2) for j in range(2)]
    p = jnp.maximum(jnp.maximum(quads[0], quads[1]),
                    jnp.maximum(quads[2], quads[3]))
    dp = d_pooled.astype(jnp.float32).reshape(bt, h2, w2, c)
    taken = None
    masks = []
    for q in quads:
        hit = (q == p).astype(jnp.float32)
        win = hit if taken is None else hit * (1.0 - taken)
        taken = win if taken is None else taken + win
        masks.append(win * dp)
    cols = [jnp.stack([masks[0], masks[1]], axis=3),
            jnp.stack([masks[2], masks[3]], axis=3)]  # (bt, h2, w2, 2, c)
    d6 = jnp.stack(cols, axis=2)                      # (bt, h2, 2, w2, 2, c)
    return d6.reshape(bt * h * w, c)


def _upsample_bwd(d_up, h, w, bt, c):
    """Backward of nearest 2x upsample at LOW res (h, w): sum the 2x2
    replicas of the HIGH-res cotangent."""
    d = d_up.reshape(bt, h * 2, w * 2, c).reshape(bt, h, 2, w, 2, c)
    return jnp.sum(d.astype(jnp.float32), axis=(2, 4)).reshape(bt * h * w, c)


def _mk_acc():
    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[...] = jnp.zeros_like(ref)
        ref[...] += val.astype(jnp.float32)

    return acc


def _cat_canon(parts):
    """Concat feature parts; a single raw windowed-ref read is split and
    re-concatenated to force a canonical Mosaic layout — the raw read's
    implicit-dim layout trips "Invalid relayout: ... replicated in
    destination" inside the BN-jacobian reductions (multi-part concats
    canonicalize as a side effect, which is why only L=0 slots hit it)."""
    if len(parts) == 1:
        p0 = parts[0]
        half = p0.shape[-1] // 2
        return jnp.concatenate([p0[:, :half], p0[:, half:]], axis=-1)
    return jnp.concatenate(list(parts), axis=-1)


def _block_fwd_vals(meta, pos, x_parts, fifo, wset, stats3, need_ahead,
                    out32=None):
    """Recompute block ``pos`` internals ONCE from its input parts.

    Returns dict(x_cat, z1, yb, z2, out32, x2[, ahead]) shared by the pool
    mask / head backward AND the block backward — the backward kernels must
    not run this twice per block. ``out32`` may be supplied from the
    forward's saved outputs (the FIFO pushes), skipping the 3x3-conv
    forward recompute entirely."""
    bt = meta["bt"]
    dtype = meta["dtype"]
    eps = meta["eps"]
    h = meta["plan"][pos]["res"]
    x_cat = _cat_canon(list(x_parts) + list(fifo))
    z1 = _norm_relu(x_cat, wset["bn1"], stats3["s1"][0], stats3["s1"][1],
                    dtype, eps)
    yb = _dot(z1, wset["w_b"], dtype).astype(dtype)
    z2 = _norm_relu(yb, wset["bn2"], stats3["s2"][0], stats3["s2"][1],
                    dtype, eps)
    # the 3x3 conv consumed the QUANTIZED activations in the forward
    # (WIG insertion point No.1) — z2q feeds its dW and dX recompute,
    # z2 keeps the pre-quant value for the STE mask and the BN2 backward
    z2q = _quan(z2, meta["bits_i"])
    if out32 is None:
        out32 = _conv3x3_t(z2q, wset["w3"], bt, h, h).astype(dtype)
    x2 = jnp.concatenate([x_cat, out32], axis=-1)
    vals = dict(x_cat=x_cat, z1=z1, yb=yb, z2=z2, z2q=z2q, out32=out32,
                x2=x2)
    if need_ahead:
        inva = jax.lax.rsqrt(stats3["sa"][1] + eps) * wset["bn_a"][0]
        shifta = wset["bn_a"][1] - stats3["sa"][0] * inva
        vals["ahead"] = _dot(
            jnp.maximum(x2.astype(dtype) * inva.astype(dtype)
                        + shifta.astype(dtype), 0),
            wset["w_a"], dtype).astype(dtype)
    return vals


def _block_bwd_generic(meta, pos, vals, fifo, wset, stats3, dW_refs_b,
                       d_fifo_refs_p, d_out32_e, d_ahead, d_skip, acc,
                       mask=None):
    """Backprop block ``pos`` from its precomputed forward values (see
    _block_fwd_vals). stats3 = dict of (2,C) stat values keyed
    s1/s2/sa[/ss]. Writes weight grads + fifo-entry cotangents; returns d
    of the concatenated base part (fp32)."""
    bt = meta["bt"]
    dtype = meta["dtype"]
    eps = meta["eps"]
    p = meta["plan"][pos]
    h = p["res"]
    x_cat, z1, yb, z2 = vals["x_cat"], vals["z1"], vals["yb"], vals["z2"]
    x2 = vals["x2"]
    mu1, var1 = stats3["s1"][0], stats3["s1"][1]
    mu2, var2 = stats3["s2"][0], stats3["s2"][1]
    # adapters backward
    d_x2, dW_a, dbn_a = _stage_bwd(x2, wset["bn_a"], wset["w_a"],
                                   stats3["sa"][0], stats3["sa"][1],
                                   d_ahead, dtype, eps)
    acc(dW_refs_b["w_a"], dW_a)
    acc(dW_refs_b["bn_a"], dbn_a)
    if d_skip is not None:
        d_x2s, dW_s, dbn_s = _stage_bwd(x2, wset["bn_s"], wset["w_s"],
                                        stats3["ss"][0], stats3["ss"][1],
                                        d_skip, dtype, eps)
        d_x2 = d_x2 + d_x2s
        acc(dW_refs_b["w_s"], dW_s)
        acc(dW_refs_b["bn_s"], dbn_s)
    k1 = p["k1"]
    d_x_cat = d_x2[:, :k1]
    d_out32 = d_x2[:, k1:] + d_out32_e.astype(jnp.float32)
    if mask is not None:
        # dropout backward: the saved out32 is POST-dropout (downstream
        # consumers see it), so the conv's cotangent is d_out32 * mask
        d_out32 = d_out32 * mask.astype(jnp.float32)
    # 3x3 conv backward (dW against the quantized activations the forward
    # consumed), then the QuanInput STE gate on the activation cotangent
    d_z2, dW3 = _conv3x3_bwd_t(vals["z2q"], wset["w3"], d_out32, bt, h, h,
                               dtype)
    acc(dW_refs_b["w3"], dW3)
    if meta["bits_i"] and meta["bits_i"] <= 15:
        d_z2 = _ste_mask(d_z2, z2)
    # bn2 backward
    d_yb, dbn2 = _affine_bwd(yb, wset["bn2"], mu2, var2, d_z2, dtype, eps,
                             z=z2)
    acc(dW_refs_b["bn2"], dbn2)
    # bottleneck dot + bn1 backward
    dW_b = _dot_dw(z1, d_yb, dtype)
    d_z1 = _dot_dx(d_yb, wset["w_b"], dtype)
    d_x1, dbn1 = _affine_bwd(x_cat, wset["bn1"], mu1, var1, d_z1, dtype, eps,
                             z=z1)
    acc(dW_refs_b["w_b"], dW_b)
    acc(dW_refs_b["bn1"], dbn1)
    d_all = d_x_cat + d_x1
    # fifo-entry cotangents
    base_width = x_cat.shape[-1] - sum(f.shape[-1] for f in fifo)
    off = base_width
    for li, f in enumerate(fifo):
        g_w = f.shape[-1]
        d_fifo_refs_p[li][...] = (
            d_all[:, off:off + g_w].astype(dtype).reshape(bt, h, h, g_w))
        off += g_w
    return d_all[:, :base_width]


def _flat_reader(meta):
    bt = meta["bt"]

    def flat(ref):
        v = ref[...]
        return v.reshape(bt * v.shape[1] * v.shape[2], v.shape[3])

    return flat


def _read_up_ins(meta, nxt, flat, seed=None):
    """Part-A (head + up blocks) input reads, in marshal order. ``seed`` =
    the pre-read drop seed scalar in "seed" mode (masks are regenerated
    in-kernel with the forward's exact bits)."""
    nb, L = meta["num_blocks"], meta["L"]
    plan = meta["plan"]
    U = list(range(nb + 1, 2 * nb + 1))
    fifo_vals, wsets, masks = {}, {}, {}
    for pos in U:
        fifo_vals[pos] = [flat(nxt()) for _ in range(L)]
        wsets[pos] = _read_wset(nxt, False)
        if meta.get("drop") == "seed":
            masks[pos] = _seed_mask(meta, seed, pos, plan[pos]["res"])
        else:
            masks[pos] = flat(nxt()) if meta.get("drop") else None
    I = dict(fifo_vals=fifo_vals, wsets=wsets, masks=masks)
    I["bn_h"], I["w_h"] = nxt()[...], nxt()[...]
    I["up_pre"] = [flat(nxt()) for _ in range(nb)]
    I["skips"] = [flat(nxt()) for _ in range(nb)]
    I["out32_vals"] = {pos: flat(nxt()) for pos in U}
    I["stats3"] = {pos: {k: nxt()[0] for k in ("s1", "s2", "sa")}
                   for pos in U}
    I["head_stat"] = nxt()[0]
    I["d_y_out"] = flat(nxt())
    I["d_head"] = flat(nxt())
    I["d_out32_ext"] = {pos: flat(nxt()) for pos in U}
    return U, I


def _read_up_outs(meta, nxt):
    """Part-A output refs EXCLUDING d_y_low / d_skips (which the merged
    single-launch kernel keeps as values)."""
    nb, L = meta["num_blocks"], meta["L"]
    U = list(range(nb + 1, 2 * nb + 1))
    d_fifo_refs = {pos: [nxt() for _ in range(L)] for pos in U}
    dW_refs = {pos: {k: nxt() for k in _wset_keys(False)} for pos in U}
    dW_head = (nxt(), nxt())
    return d_fifo_refs, dW_refs, dW_head


def _run_up(meta, U, I, d_fifo_refs, dW_refs, dW_head, acc):
    """Head + up-path backward from pre-read inputs. Returns
    (d_y_low fp32 flat, d_skips list[j -> fp32 flat])."""
    nb = meta["num_blocks"]
    bt = meta["bt"]
    c = meta["chan"]
    dtype = meta["dtype"]
    eps = meta["eps"]
    plan = meta["plan"]
    up_pre, skips = I["up_pre"], I["skips"]

    def block_input(pos):
        idx = pos - (nb + 1)
        j = nb - 1 - idx
        h = plan[pos]["res"]
        return [_upsample2_cat(up_pre[idx], h // 2, h // 2, bt), skips[j]]

    d_y = I["d_y_out"].astype(jnp.float32)
    d_skips_out = [None] * nb
    # dev-only compile bisect (cf. CUNET_TSBWD_DOWN_STOP): stop emitting
    # block backwards after N up blocks — WRONG RESULTS, diagnosis only
    _stop = int(os.environ.get("CUNET_TSBWD_UP_STOP", "99"))
    for seg, pos in enumerate(reversed(U)):
        if seg >= _stop:
            for jj in range(nb):
                if d_skips_out[jj] is None:
                    d_skips_out[jj] = jnp.zeros(
                        (bt * plan[jj]["res"] ** 2, c), jnp.float32)
            r0 = plan[nb]["res"]
            return jnp.zeros((bt * r0 * r0, c), jnp.float32), d_skips_out
        idx = pos - (nb + 1)
        j = nb - 1 - idx
        h = plan[pos]["res"]
        vals = _block_fwd_vals(meta, pos, block_input(pos),
                               I["fifo_vals"][pos], I["wsets"][pos],
                               I["stats3"][pos], need_ahead=pos == 2 * nb,
                               out32=I["out32_vals"][pos])
        if pos == 2 * nb:
            # head backward rides the last up block (its input is y_out)
            d_h_in, dW_h, dbn_h = _stage_bwd(
                vals["ahead"], I["bn_h"], I["w_h"], I["head_stat"][0],
                I["head_stat"][1], I["d_head"], dtype, eps,
                bits_i=meta["bits_i"])
            acc(dW_head[1], dW_h)
            acc(dW_head[0], dbn_h)
            d_y = d_y + d_h_in
        d_base = _block_bwd_generic(
            meta, pos, vals, I["fifo_vals"][pos], I["wsets"][pos],
            I["stats3"][pos], dW_refs[pos], d_fifo_refs[pos],
            I["d_out32_ext"][pos], d_y, None, acc, mask=I["masks"][pos])
        d_up = d_base[:, :c]
        d_skips_out[j] = d_base[:, c:2 * c]
        d_y = _upsample_bwd(d_up, h // 2, h // 2, bt, c)
    return d_y, d_skips_out


def _slot_bwd_up_kernel(meta, *refs):
    """Backward part A: head + up blocks (traversal pos 2nb .. nb+1).

    Emits d_skips (fp32, consumed by part B), d of the neck output (fp32),
    up-fifo cotangents, and up-block + head weight grads."""
    nb = meta["num_blocks"]
    bt = meta["bt"]
    c = meta["chan"]
    plan = meta["plan"]
    it = iter(refs)
    nxt = lambda: next(it)
    flat = _flat_reader(meta)

    seed = nxt()[0] if meta.get("drop") == "seed" else None
    U, I = _read_up_ins(meta, nxt, flat, seed=seed)
    d_y_low_ref = nxt()
    d_skip_refs = [nxt() for _ in range(nb)]
    d_fifo_refs, dW_refs, dW_head = _read_up_outs(meta, nxt)
    acc = _mk_acc()
    d_y_low, d_skips = _run_up(meta, U, I, d_fifo_refs, dW_refs, dW_head,
                               acc)
    for j in range(nb):
        h = plan[j]["res"]
        d_skip_refs[j][...] = d_skips[j].reshape(bt, h, h, c).astype(
            d_skip_refs[j].dtype)
    r = plan[nb]["res"]
    d_y_low_ref[...] = d_y_low.reshape(bt, r, r, c).astype(
        d_y_low_ref.dtype)


def _read_down_ins(meta, nxt, flat, with_d=True, seed=None):
    """Part-B (neck + down + intermedia) input reads, in marshal order.
    ``with_d=False`` (merged single-launch mode) skips the d_y_low /
    d_skips inputs — they arrive as values from _run_up. ``seed`` = the
    pre-read drop seed scalar in "seed" mode."""
    nb, L = meta["num_blocks"], meta["L"]
    has_inter = meta["has_inter"]
    plan = meta["plan"]
    D = list(range(nb + 1))
    I = {}
    I["y"] = flat(nxt())
    I["inter_fifo"] = []
    if has_inter:
        I["inter_fifo"] = [flat(nxt()) for _ in range(L)]
        I["bn_i"], I["w_i"] = nxt()[...], nxt()[...]
    fifo_vals, wsets, masks = {}, {}, {}
    for pos in D:
        fifo_vals[pos] = [flat(nxt()) for _ in range(L)]
        wsets[pos] = _read_wset(nxt, plan[pos]["skip"])
        if meta.get("drop") == "seed":
            masks[pos] = _seed_mask(meta, seed, pos, plan[pos]["res"])
        else:
            masks[pos] = flat(nxt()) if meta.get("drop") else None
    I["fifo_vals"], I["wsets"], I["masks"] = fifo_vals, wsets, masks
    I["pooled"] = [flat(nxt()) for _ in range(nb)]
    I["out32_vals"] = {pos: flat(nxt()) for pos in D}
    I["inter_stat"] = nxt()[0] if has_inter else None
    stats3 = {}
    for pos in D:
        keys = ("s1", "s2", "sa") + (("ss",) if plan[pos]["skip"] else ())
        stats3[pos] = {k: nxt()[0] for k in keys}
    I["stats3"] = stats3
    if with_d:
        I["d_y_low"] = flat(nxt())
        I["d_skips"] = [flat(nxt()) for _ in range(nb)]
    I["d_inter_out"] = flat(nxt()) if has_inter else None
    I["d_out32_ext"] = {pos: flat(nxt()) for pos in D}
    return D, I


def _read_down_outs(meta, nxt):
    nb, L = meta["num_blocks"], meta["L"]
    has_inter = meta["has_inter"]
    plan = meta["plan"]
    D = list(range(nb + 1))
    O = {}
    O["d_y_ref"] = nxt()
    O["d_inter_fifo_refs"] = [nxt() for _ in range(L)] if has_inter else []
    O["d_fifo_refs"] = {pos: [nxt() for _ in range(L)] for pos in D}
    if has_inter:
        O["dW_inter"] = (nxt(), nxt())
    O["dW_refs"] = {pos: {k: nxt() for k in _wset_keys(plan[pos]["skip"])}
                    for pos in D}
    return O


def _run_down(meta, D, I, O, d_y_low, d_skips, acc):
    """Neck + down path + intermedia backward from pre-read inputs and
    part A's cotangents (values or ref-loads, both fp32 flat)."""
    nb = meta["num_blocks"]
    L = meta["L"]
    has_inter = meta["has_inter"]
    h0 = meta["h"]
    bt = meta["bt"]
    c = meta["chan"]
    dtype = meta["dtype"]
    eps = meta["eps"]
    plan = meta["plan"]
    y = I["y"]

    # ---- recompute the intermedia output (input of down block 0) ----
    if has_inter:
        x_cat_i = jnp.concatenate([y] + I["inter_fifo"], axis=-1)
        mu_i, var_i = I["inter_stat"][0], I["inter_stat"][1]
        z_i = _norm_relu(x_cat_i, I["bn_i"], mu_i, var_i, dtype, eps)
        y2 = _dot(z_i, I["w_i"], dtype).astype(dtype)
    else:
        y2 = y

    def block_input(pos):
        return [y2] if pos == 0 else [I["pooled"][pos - 1]]

    # dev-only compile bisect: stop emitting ops after N segments (outputs
    # beyond that point stay unwritten — WRONG RESULTS, diagnosis only)
    _stop = int(os.environ.get("CUNET_TSBWD_DOWN_STOP", "99"))
    _seg = [0]

    def _stopped():
        _seg[0] += 1
        return _seg[0] > _stop

    # --- neck (pos nb) ---
    if _stopped():
        return
    neck_vals = _block_fwd_vals(meta, nb, block_input(nb),
                                I["fifo_vals"][nb], I["wsets"][nb],
                                I["stats3"][nb], need_ahead=False,
                                out32=I["out32_vals"][nb])
    d_pool = _block_bwd_generic(
        meta, nb, neck_vals, I["fifo_vals"][nb], I["wsets"][nb],
        I["stats3"][nb], O["dW_refs"][nb], O["d_fifo_refs"][nb],
        I["d_out32_ext"][nb], d_y_low.astype(jnp.float32), None, acc,
        mask=I["masks"][nb])

    # --- down path (pos nb-1 .. 0) ---
    for pos in range(nb - 1, -1, -1):
        if _stopped():
            return
        h = plan[pos]["res"]
        # one shared recompute: ahead feeds the pool mask (ahead = pre-pool;
        # pooled[pos] saved), the rest feeds the block backward
        vals = _block_fwd_vals(meta, pos, block_input(pos),
                               I["fifo_vals"][pos], I["wsets"][pos],
                               I["stats3"][pos], need_ahead=True,
                               out32=I["out32_vals"][pos])
        d_ahead = _pool_bwd(d_pool, vals["ahead"], I["pooled"][pos], h, h,
                            bt)
        d_pool = _block_bwd_generic(
            meta, pos, vals, I["fifo_vals"][pos], I["wsets"][pos],
            I["stats3"][pos], O["dW_refs"][pos], O["d_fifo_refs"][pos],
            I["d_out32_ext"][pos], d_ahead,
            d_skips[pos].astype(jnp.float32), acc, mask=I["masks"][pos])
        # d_pool now holds d of this block's input

    # --- intermedia backward ---
    if _stopped():
        return
    if has_inter:
        d_y2 = d_pool + I["d_inter_out"].astype(jnp.float32)
        # y2 = relu(norm(x_cat_i)) @ w_i (cast dtype — cast bwd is identity)
        dW_i = _dot_dw(z_i, d_y2, dtype)
        d_zi = _dot_dx(d_y2, I["w_i"], dtype)
        d_xi, dbn_i = _affine_bwd(x_cat_i, I["bn_i"], mu_i, var_i, d_zi,
                                  dtype, eps, z=z_i)
        acc(O["dW_inter"][1], dW_i)
        acc(O["dW_inter"][0], dbn_i)
        O["d_y_ref"][...] = d_xi[:, :c].astype(dtype).reshape(bt, h0, h0, c)
        off = c
        for li in range(L):
            O["d_inter_fifo_refs"][li][...] = (
                d_xi[:, off:off + c].astype(dtype).reshape(bt, h0, h0, c))
            off += c
    else:
        O["d_y_ref"][...] = d_pool.astype(dtype).reshape(bt, h0, h0, c)


def _slot_bwd_down_kernel(meta, *refs):
    """Backward part B: neck + down blocks + intermedia, consuming part A's
    d_skips and d of the neck output."""
    it = iter(refs)
    nxt = lambda: next(it)
    flat = _flat_reader(meta)
    seed = nxt()[0] if meta.get("drop") == "seed" else None
    D, I = _read_down_ins(meta, nxt, flat, with_d=True, seed=seed)
    O = _read_down_outs(meta, nxt)
    acc = _mk_acc()
    _run_down(meta, D, I, O, I["d_y_low"], I["d_skips"], acc)


def _slot_bwd_single_kernel(meta, *refs):
    """MERGED single-launch whole-slot backward (CUNET_TSBWD_SINGLE=1):
    part A's d_y_low / d_skips stay in-register values instead of making an
    HBM round trip, and the slot backward costs one kernel launch instead
    of two. VMEM feasibility depends on the chunked conv transients
    (_TRAIN_CONV_CHUNK) — compile-probed on-chip before becoming a
    default."""
    it = iter(refs)
    nxt = lambda: next(it)
    flat = _flat_reader(meta)
    seed_u = nxt()[0] if meta.get("drop") == "seed" else None
    U, IU = _read_up_ins(meta, nxt, flat, seed=seed_u)
    seed_d = nxt()[0] if meta.get("drop") == "seed" else None
    D, ID = _read_down_ins(meta, nxt, flat, with_d=False, seed=seed_d)
    d_fifo_refs_u, dW_refs_u, dW_head = _read_up_outs(meta, nxt)
    OD = _read_down_outs(meta, nxt)
    acc = _mk_acc()
    d_y_low, d_skips = _run_up(meta, U, IU, d_fifo_refs_u, dW_refs_u,
                               dW_head, acc)
    _run_down(meta, D, ID, OD, d_y_low, d_skips, acc)


def _stat_slices(meta):
    """Index of each position's stat arrays in the forward emission order:
    [inter] + per pos (s1, s2, sa[, ss]) + head. Returns (per_pos, head_i,
    inter_i|None)."""
    plan = meta["plan"]
    inter_i = 0 if meta["has_inter"] else None
    si = 1 if meta["has_inter"] else 0
    per_pos = []
    for p in plan:
        keys = ("s1", "s2", "sa") + (("ss",) if p["skip"] else ())
        per_pos.append({k: si + j for j, k in enumerate(keys)})
        si += len(keys)
    return per_pos, si, inter_i


def _wset_keys(skip: bool):
    return ("bn1", "w_b", "bn2", "w3", "bn_a", "w_a") + (
        ("bn_s", "w_s") if skip else ())


def slot_train_bwd(
    y, inter_fifo, fifos, W, saved, cts, *, meta: Dict, interpret: bool = False,
    masks=None,
):
    """Two-launch train backward (part A: head + up path, part B: neck +
    down path + intermedia; one whole-slot kernel exceeds v5e VMEM).
    ``cts`` = (d_y_out, d_head, d_inter_out, d_out32s). Returns
    (d_y, d_inter_fifo, d_fifos, dW) with dW matching W's structure in
    fp32."""
    nb = meta["num_blocks"]
    L = meta["L"]
    has_inter = meta["has_inter"]
    h0 = meta["h"]
    bt = meta["bt"]
    c = meta["chan"]
    dtype = meta["dtype"]
    plan = meta["plan"]
    n = y.shape[0]
    T = n // bt

    d_y_out, d_head, d_inter_out, d_out32s = cts
    per_pos_stat, head_stat_i, inter_stat_i = _stat_slices(meta)

    def xspec(a):
        return pl.BlockSpec((bt,) + a.shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    def statspec(a):
        return pl.BlockSpec((1, 2, a.shape[-1]), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(kernel, args, specs, out_shapes, out_specs):
        return pl.pallas_call(
            functools.partial(kernel, meta),
            grid=(T,),
            in_specs=specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    class M:
        """Arg/spec/out marshaling scratchpad."""

        def __init__(self):
            self.args, self.specs = [], []
            self.out_shapes, self.out_specs = [], []

        def add(self, a, spec):
            self.args.append(a)
            self.specs.append(spec(a))

        def add_seed(self):
            if meta.get("drop") == "seed":
                self.add(masks[0],
                         lambda a: pl.BlockSpec(memory_space=pltpu.SMEM))

        def add_wset(self, pos):
            for k in _wset_keys(plan[pos]["skip"]):
                a = W["blocks"][pos][k]
                self.add(a.astype(jnp.float32 if k.startswith("bn")
                                  else dtype), full)
            if meta.get("drop") == "masks":
                self.add(masks[pos].astype(dtype), xspec)

        def out_tiled(self, hh, ch, dt=None):
            self.out_shapes.append(
                jax.ShapeDtypeStruct((n, hh, hh, ch), dt or dtype))
            self.out_specs.append(pl.BlockSpec((bt, hh, hh, ch),
                                               lambda i: (i, 0, 0, 0),
                                               memory_space=pltpu.VMEM))

        def out_acc(self, shape):
            self.out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
            self.out_specs.append(pl.BlockSpec(
                shape, lambda i: tuple(0 for _ in shape),
                memory_space=pltpu.VMEM))

    # ======== part A: head + up blocks ========
    U = list(range(nb + 1, 2 * nb + 1))
    A = M()
    A.add_seed()
    for pos in U:
        for f in fifos[pos]:
            A.add(f.astype(dtype), xspec)
        A.add_wset(pos)
    A.add(W["head"][0].astype(jnp.float32), full)
    A.add(W["head"][1].astype(dtype), full)
    for a in saved["up_pre"] + saved["skips"]:
        A.add(a, xspec)
    for pos in U:
        A.add(saved["out32s"][pos], xspec)
    for pos in U:
        for k in ("s1", "s2", "sa"):
            A.add(saved["stats"][per_pos_stat[pos][k]], statspec)
    A.add(saved["stats"][head_stat_i], statspec)
    A.add(d_y_out.astype(dtype), xspec)
    A.add(d_head.astype(dtype), xspec)
    for pos in U:
        A.add(d_out32s[pos].astype(dtype), xspec)

    # dev-only fault isolation: CUNET_TSBWD_ONLY=up|down runs just one of
    # the two backward launches (the other's outputs become zeros — WRONG
    # RESULTS, compile diagnosis only). CUNET_TSBWD_SINGLE=1 merges both
    # parts into ONE launch (d_y_low / d_skips stay in-register).
    _only = os.environ.get("CUNET_TSBWD_ONLY", "")
    single = os.environ.get("CUNET_TSBWD_SINGLE", "0") == "1" and not _only

    r_neck = plan[nb]["res"]
    dcot = dtype if _TSBWD_DCOT == "compute" else jnp.float32
    if not single:
        A.out_tiled(r_neck, c, dcot)                 # d_y_low
        for j in range(nb):
            A.out_tiled(plan[j]["res"], c, dcot)     # d_skips
    for pos in U:
        for li in range(L):
            A.out_tiled(plan[pos]["res"], fifos[pos][li].shape[-1])
    for pos in U:
        for k in _wset_keys(False):
            A.out_acc(W["blocks"][pos][k].shape)
    A.out_acc(W["head"][0].shape)
    A.out_acc(W["head"][1].shape)

    d_y_low = d_skips = None
    if single:
        pass                         # merged call happens after B is built
    elif _only == "down":
        # plausibly-shaped fakes derived from real tensors — jnp.zeros here
        # would reach the down kernel as XLA *broadcast* operands, whose
        # replicated Mosaic layout itself fails, poisoning the isolation
        outs = [jnp.zeros(s.shape, s.dtype) for s in A.out_shapes]
        outs[0] = saved["pooled"][-1].astype(jnp.float32) * 1e-6
        for j in range(nb):
            outs[1 + j] = saved["skips"][j].astype(jnp.float32) * 1e-6
    else:
        outs = list(call(_slot_bwd_up_kernel, A.args, A.specs,
                         A.out_shapes, A.out_specs))
    if not single:
        d_y_low = outs.pop(0)
        d_skips = [outs.pop(0) for _ in range(nb)]
        d_fifos_up = {pos: tuple(outs.pop(0) for _ in range(L)) for pos in U}
        dW_up = {pos: {k: outs.pop(0) for k in _wset_keys(False)}
                 for pos in U}
        dW_head = (outs.pop(0), outs.pop(0))
        assert not outs

    # ======== part B: neck + down blocks + intermedia ========
    D = list(range(nb + 1))
    B = M()
    B.add_seed()
    B.add(y.astype(dtype), xspec)
    if has_inter:
        for f in inter_fifo:
            B.add(f.astype(dtype), xspec)
        B.add(W["inter"][0].astype(jnp.float32), full)
        B.add(W["inter"][1].astype(dtype), full)
    for pos in D:
        for f in fifos[pos]:
            B.add(f.astype(dtype), xspec)
        B.add_wset(pos)
    for a in saved["pooled"]:
        B.add(a, xspec)
    for pos in D:
        B.add(saved["out32s"][pos], xspec)
    if has_inter:
        B.add(saved["stats"][inter_stat_i], statspec)
    for pos in D:
        for k in (("s1", "s2", "sa") + (("ss",) if plan[pos]["skip"]
                                        else ())):
            B.add(saved["stats"][per_pos_stat[pos][k]], statspec)
    if not single:
        B.add(d_y_low, xspec)
        for d in d_skips:
            B.add(d, xspec)
    if has_inter:
        B.add(d_inter_out.astype(dtype), xspec)
    for pos in D:
        B.add(d_out32s[pos].astype(dtype), xspec)

    B.out_tiled(h0, c)                   # d_y
    if has_inter:
        for _ in range(L):
            B.out_tiled(h0, c)           # d_inter_fifo
    for pos in D:
        for li in range(L):
            B.out_tiled(plan[pos]["res"], fifos[pos][li].shape[-1])
    if has_inter:
        B.out_acc(W["inter"][0].shape)
        B.out_acc(W["inter"][1].shape)
    for pos in D:
        for k in _wset_keys(plan[pos]["skip"]):
            B.out_acc(W["blocks"][pos][k].shape)

    if single:
        outs = list(call(_slot_bwd_single_kernel,
                         A.args + B.args, A.specs + B.specs,
                         A.out_shapes + B.out_shapes,
                         A.out_specs + B.out_specs))
        d_fifos_up = {pos: tuple(outs.pop(0) for _ in range(L)) for pos in U}
        dW_up = {pos: {k: outs.pop(0) for k in _wset_keys(False)}
                 for pos in U}
        dW_head = (outs.pop(0), outs.pop(0))
    elif _only == "up":
        outs = [jnp.zeros(s.shape, s.dtype) for s in B.out_shapes]
    else:
        outs = list(call(_slot_bwd_down_kernel, B.args, B.specs,
                         B.out_shapes, B.out_specs))
    d_y = outs.pop(0)
    d_inter_fifo = tuple(outs.pop(0) for _ in range(L)) if has_inter else ()
    d_fifos_down = {pos: tuple(outs.pop(0) for _ in range(L)) for pos in D}
    dW: Dict = {}
    if has_inter:
        dW["inter"] = (outs.pop(0), outs.pop(0))
    dW_down = {pos: {k: outs.pop(0) for k in _wset_keys(plan[pos]["skip"])}
               for pos in D}
    assert not outs

    d_fifos = tuple(
        (d_fifos_down if pos <= nb else d_fifos_up)[pos]
        for pos in range(len(plan))
    )
    dW["blocks"] = [
        (dW_down if pos <= nb else dW_up)[pos] for pos in range(len(plan))
    ]
    dW["head"] = dW_head
    return d_y, d_inter_fifo, d_fifos, dW


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_slot_fn(nb, L, has_inter, h0, bt, c, g, cb, dtype_str, interpret,
                  bits_i=0, conv_chunk=None, drop=False, drop_rate=0.0,
                  dcot="f32"):
    # conv_chunk / dcot are the _TRAIN_CONV_CHUNK / _TSBWD_DCOT settings at
    # call time; they are read by the kernel body at trace time via the
    # module globals, and they are part of this cache key purely so an
    # env/monkeypatch override can never reuse a kernel traced under a
    # different setting.
    meta = finalize_meta(
        dict(num_blocks=nb, L=L, has_inter=has_inter, bt=bt, chan=c,
             growth=g, cb=cb, dtype=jnp.dtype(dtype_str), eps=BN_EPS,
             bits_i=bits_i, drop=drop, drop_rate=drop_rate),
        h0,
    )

    def run_fwd(y, inter_fifo, fifos, W, masks):
        y_out, head, inter_out, out32s, saved = slot_train_fwd(
            y, list(inter_fifo), [list(f) for f in fifos], W,
            meta=meta, interpret=interpret, masks=list(masks) or None,
        )
        # the backward reuses the per-position conv outputs instead of
        # recomputing the 3x3 conv forward
        saved = dict(saved, out32s=list(out32s))
        if has_inter:
            outs = (y_out, head, inter_out, tuple(out32s),
                    tuple(saved["stats"]))
        else:
            outs = (y_out, head, tuple(out32s), tuple(saved["stats"]))
        return outs, saved

    @jax.custom_vjp
    def f(y, inter_fifo, fifos, W, masks):
        outs, _ = run_fwd(y, inter_fifo, fifos, W, masks)
        return outs

    def fwd(y, inter_fifo, fifos, W, masks):
        outs, saved = run_fwd(y, inter_fifo, fifos, W, masks)
        return outs, (y, inter_fifo, fifos, W, masks, saved)

    def bwd(res, cts):
        y, inter_fifo, fifos, W, masks, saved = res
        if has_inter:
            d_y_out, d_head, d_inter_out, d_out32s, _unused = cts
        else:
            d_y_out, d_head, d_out32s, _unused = cts
            d_inter_out = None
        d_y, d_if, d_f, dW = slot_train_bwd(
            y, list(inter_fifo), [list(f) for f in fifos], W, saved,
            (d_y_out, d_head, d_inter_out, list(d_out32s)),
            meta=meta, interpret=interpret, masks=list(masks) or None,
        )
        # masks are constants of the step (zero cotangent); the "seed" mode
        # entry is an int32 array, whose tangent type is float0
        import numpy as np

        d_masks = tuple(
            np.zeros(m.shape, dtype=jax.dtypes.float0)
            if jnp.issubdtype(m.dtype, jnp.integer) else jnp.zeros_like(m)
            for m in masks)
        return d_y.astype(y.dtype), d_if, d_f, dW, d_masks

    f.defvjp(fwd, bwd)
    return f


def fused_slot_train(y, inter_fifo, fifos, W, *, cfg, L, has_inter,
                     interpret=False, bits_i=0, masks=None, drop_seed=None):
    """Whole-slot fused train forward with custom-VJP backward.

    Returns (y_out, head, inter_out|None, out32s tuple, stats tuple) where
    stats are per-tile (T, 2, C) fp32 arrays in kernel emission order.
    Requires cfg.bn_tile > 0 (the grid batch tile = BN stat group).
    ``bits_i`` > 0 runs the WIG activation quantizers (QuanInput STE) at
    both reference insertion points inside the kernels; weight quantization
    happens OUTSIDE via ``quant.transforms.quantize_params`` (the kernels
    receive the already-fake-quantized weights and their custom VJP feeds
    the XNOR/STE weight backward automatically).
    Dense-layer dropout (ref:models/cu_net.py:63-64) comes in two forms:
    ``masks`` = per-position precomputed scaled masks ((n, res, res, growth)
    arrays with values {0, 1/keep}) threaded as kernel inputs; OR
    ``drop_seed`` = a (1,) int32 seed — masks are generated IN-KERNEL by the
    counter-hash PRNG (ops/dropmask.py) and regenerated bit-identically by
    the recompute-backward kernels (no HBM mask stream).
    """
    assert masks is None or drop_seed is None, \
        "pass precomputed masks OR an in-kernel drop seed, not both"
    h0 = y.shape[1]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Mosaic only targets TPU; CPU runs interpret mode
    drop = "seed" if drop_seed is not None else (
        "masks" if masks is not None else False)
    fn = _make_slot_fn(
        cfg.num_blocks, L, has_inter, h0, cfg.bn_tile, cfg.init_chan_num,
        cfg.growth_rate, cfg.bottleneck_chan, str(cfg.compute_dtype),
        interpret, int(bits_i), _TRAIN_CONV_CHUNK, drop,
        float(cfg.drop_rate) if drop == "seed" else 0.0, _TSBWD_DCOT,
    )
    if drop == "seed":
        mask_args = (jnp.asarray(drop_seed, jnp.int32).reshape(1),)
    elif drop == "masks":
        mask_args = tuple(masks)
    else:
        mask_args = ()
    outs = fn(y, tuple(inter_fifo), tuple(tuple(f) for f in fifos), W,
              mask_args)
    if has_inter:
        y_out, head, inter_out, out32s, stats = outs
    else:
        y_out, head, out32s, stats = outs
        inter_out = None
    return y_out, head, inter_out, out32s, stats
