"""Pallas mega-kernel: one launch per dense block (inference).

Measured on this TPU stack, every kernel launch costs ~0.3 ms regardless of
size, so CU-Net inference is launch-bound: the lax path emits ~5-10 kernels
per dense block. This kernel computes the ENTIRE block in one launch, with
every intermediate resident in VMEM:

    [optional 2x nearest-upsample of the first feature (up blocks)]
    bottleneck: sum_k relu(x_k * inv + shift) @ W_k      (1x1, concat-free)
    norm2+ReLU: relu(y * inv2 + shift2)
    3x3 conv:   sum_{dy,dx} shift(y)[dy,dx] @ W3[dy,dx]  (9 shifted matmuls)
    adapters:   ahead (+ skip) bottlenecks over feats + [conv2 out]
    [optional 2x2 maxpool of the ahead output (down blocks)]

Grid is over the batch dimension: each program owns one image's full
feature maps (max VMEM tenancy ~7 MB at h=64, c_tot=352). All BN affines
are eval-mode folded scale/shift.

This is the TPU-native realization of the reference's fused bottleneck
runtime (ref:models/cu_net_prev_version.py:520-769) taken to its logical
end: not just concat-free, but whole-block-fused.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_matmul_3x3(y_hwc, w3, h, w, cin, cout):
    """3x3 SAME conv via 9 shifted (h*w, cin) @ (cin, cout) matmuls.

    Zero-pad once, then each tap is a static slice — no rolls/masks (Mosaic
    rejects the zero-size slices jnp.roll would lower to for shift 0).
    """
    ypad = jnp.pad(y_hwc, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h * w, cout), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    for dy in range(3):
        for dx in range(3):
            tap = ypad[dy : dy + h, dx : dx + w, :].reshape(h * w, cin)
            acc = acc + jax.lax.dot_general(
                tap.astype(y_hwc.dtype),
                w3[dy, dx],
                dn,
                preferred_element_type=jnp.float32,
            )
    return acc


def _block_kernel(
    meta,
    *refs,
):
    """meta: dict of static config. refs layout (all VMEM):
    x_0..x_{F-1},
    vec_bneck (2, Cin_tot), w_bneck_0..w_bneck_{F-1},
    vec2 (2, Cb), w3 (3, 3, Cb, G),
    vec_a (2, Cad_tot), wa_0..wa_F,          [F+1 groups: feats + conv2-out]
    [vec_s (2, Cad_tot), ws_0..ws_F,]        [if skip]
    outs: ahead [, skip] [, layer_out]
    """
    F = meta["n_feats"]
    P = meta["n_pre"]          # pre-bottleneck (intermedia) feature count, 0 = off
    h, w = meta["h"], meta["w"]
    cb, g = meta["cb"], meta["g"]
    cout = meta["cout"]
    skip = meta["skip"]
    head = meta["head"]
    upsample_first = meta["upsample_first"]
    pool_ahead = meta["pool_ahead"]
    emit_layer_out = meta["emit_layer_out"]
    dtype = meta["dtype"]

    idx = 0
    pre_refs = refs[idx : idx + P]; idx += P
    if P:
        vec_p = refs[idx]; idx += 1
        wp = refs[idx : idx + P]; idx += P
    x_refs = refs[idx : idx + F]; idx += F
    vec_b = refs[idx]; idx += 1
    wb = refs[idx : idx + F]; idx += F
    vec2 = refs[idx]; idx += 1
    w3 = refs[idx]; idx += 1
    vec_a = refs[idx]; idx += 1
    wa = refs[idx : idx + F + 1]; idx += F + 1
    if skip:
        vec_s = refs[idx]; idx += 1
        ws = refs[idx : idx + F + 1]; idx += F + 1
    if head:
        vec_h = refs[idx]; idx += 1
        wh = refs[idx]; idx += 1
    out_refs = refs[idx:]

    dn = (((1,), (0,)), ((), ()))
    m = h * w

    # ---- optional pre-bottleneck (the intermedia adapter fused in) ----
    pre_out = None
    if P:
        acc_p = jnp.zeros((m, meta["c_pre_out"]), jnp.float32)
        off = 0
        for k in range(P):
            c_k = pre_refs[k].shape[-1]
            xk = pre_refs[k][0].reshape(m, c_k).astype(jnp.float32)
            yk = jnp.maximum(
                xk * vec_p[0, off : off + c_k] + vec_p[1, off : off + c_k], 0.0
            )
            acc_p = acc_p + jax.lax.dot_general(
                yk.astype(dtype), wp[k][...], dn, preferred_element_type=jnp.float32
            )
            off += c_k
        pre_out = acc_p.astype(dtype).reshape(h, w, meta["c_pre_out"])

    # load features (one image each), upsampling the first if requested
    feats = []
    for k in range(F):
        if k == 0 and pre_out is not None:
            feats.append(pre_out)
            continue
        xk = x_refs[k][0]  # (h_k, w_k, c_k)
        if k == 0 and upsample_first:
            hh, ww, cc = xk.shape
            xk = jnp.broadcast_to(
                xk[:, None, :, None, :], (hh, 2, ww, 2, cc)
            ).reshape(hh * 2, ww * 2, cc)
        feats.append(xk)

    # ---- bottleneck 1x1 over virtual concat ----
    acc = jnp.zeros((m, cb), jnp.float32)
    off = 0
    for k in range(F):
        c_k = feats[k].shape[-1]
        xk = feats[k].reshape(m, c_k).astype(jnp.float32)
        yk = jnp.maximum(xk * vec_b[0, off : off + c_k] + vec_b[1, off : off + c_k], 0.0)
        acc = acc + jax.lax.dot_general(
            yk.astype(dtype), wb[k][...], dn, preferred_element_type=jnp.float32
        )
        off += c_k

    # ---- norm2 + relu + 3x3 conv ----
    y2 = jnp.maximum(acc * vec2[0, :] + vec2[1, :], 0.0).astype(dtype)
    out32 = _shifted_matmul_3x3(y2.reshape(h, w, cb), w3[...], h, w, cb, g)
    out32 = out32.astype(dtype)  # (m, g) flattened below
    out32_flat = out32.reshape(m, g)

    # ---- adapters over feats + [conv2 out] ----
    def adapter(vec, w_list):
        acc_a = jnp.zeros((m, cout), jnp.float32)
        off = 0
        for k in range(F):
            c_k = feats[k].shape[-1]
            xk = feats[k].reshape(m, c_k).astype(jnp.float32)
            yk = jnp.maximum(xk * vec[0, off : off + c_k] + vec[1, off : off + c_k], 0.0)
            acc_a = acc_a + jax.lax.dot_general(
                yk.astype(dtype), w_list[k][...], dn,
                preferred_element_type=jnp.float32,
            )
            off += c_k
        ylast = jnp.maximum(
            out32_flat.astype(jnp.float32) * vec[0, off : off + g]
            + vec[1, off : off + g],
            0.0,
        )
        return acc_a + jax.lax.dot_general(
            ylast.astype(dtype), w_list[F][...], dn,
            preferred_element_type=jnp.float32,
        )

    ahead = adapter(vec_a, wa).astype(dtype).reshape(h, w, cout)
    o = 0
    if pool_ahead:
        pooled = jnp.max(
            ahead.reshape(h // 2, 2, w // 2, 2, cout), axis=(1, 3)
        )
        out_refs[o][0] = pooled
    else:
        out_refs[o][0] = ahead
    o += 1
    if skip:
        sk = adapter(vec_s, ws).astype(dtype).reshape(h, w, cout)
        out_refs[o][0] = sk
        o += 1
    if emit_layer_out:
        out_refs[o][0] = out32_flat.reshape(h, w, g)
        o += 1
    if head:
        zh = jnp.maximum(
            ahead.reshape(m, cout).astype(jnp.float32) * vec_h[0, :] + vec_h[1, :],
            0.0,
        )
        hm = jax.lax.dot_general(
            zh.astype(dtype), wh[...], dn, preferred_element_type=jnp.float32
        )
        out_refs[o][0] = hm.astype(dtype).reshape(h, w, meta["c_head"])
        o += 1
    if P and meta["emit_pre_out"]:
        out_refs[o][0] = pre_out


def fused_dense_block_infer(
    features: Sequence[jnp.ndarray],
    bneck_vec: jnp.ndarray,      # (2, Cin_tot): [inv; shift]
    bneck_w: jnp.ndarray,        # (1, 1, Cin_tot, Cb)
    vec2: jnp.ndarray,           # (2, Cb)
    w3: jnp.ndarray,             # (3, 3, Cb, G)
    ahead_vec: jnp.ndarray,      # (2, Cin_tot + G)
    ahead_w: jnp.ndarray,        # (1, 1, Cin_tot + G, Cout)
    skip_vec: Optional[jnp.ndarray] = None,
    skip_w: Optional[jnp.ndarray] = None,
    *,
    pre_features: Optional[Sequence[jnp.ndarray]] = None,
    pre_vec: Optional[jnp.ndarray] = None,
    pre_w: Optional[jnp.ndarray] = None,
    emit_pre_out: bool = True,
    head_vec: Optional[jnp.ndarray] = None,
    head_w: Optional[jnp.ndarray] = None,
    upsample_first: bool = False,
    pool_ahead: bool = False,
    emit_layer_out: bool = True,
    interpret: bool = False,
):
    """One-launch dense block (see module docstring).

    Optional fused stages:
    - ``pre_*``: a 1x1 bottleneck over ``pre_features`` whose output becomes
      feature 0 (the intermedia adapter fused into the first down block);
      ``features[0]`` is then only a shape donor for feature 0's slot.
    - ``head_*``: BN->ReLU->1x1 head on the ahead output (an anchored slot's
      head fused into its last up block).

    ``features`` are NHWC; when ``upsample_first`` the first feature enters
    at half resolution. Returns
    (ahead[, skip][, layer_out][, head_out][, pre_out]); ahead is 2x2-
    maxpooled when ``pool_ahead``.
    """
    from cunet_tpu.kernels.common import auto_interpret
    interpret = auto_interpret(interpret)

    f0 = features[0]
    n = f0.shape[0]
    h = f0.shape[1] * (2 if upsample_first else 1)
    w = f0.shape[2] * (2 if upsample_first else 1)
    dtype = f0.dtype
    F = len(features)
    cb = bneck_w.shape[3]
    g = w3.shape[3]
    cout = ahead_w.shape[3]
    skip = skip_w is not None
    head = head_w is not None
    pre = pre_w is not None
    P = len(pre_features) if pre else 0
    assert not (pre and upsample_first), "pre-stage excludes upsample_first"

    cs = [f.shape[-1] for f in features]
    offs = np.cumsum([0] + cs)
    cin_tot = int(offs[-1])
    assert bneck_w.shape[2] == cin_tot and ahead_w.shape[2] == cin_tot + g

    wb = [bneck_w[0, 0, offs[k] : offs[k + 1], :].astype(dtype) for k in range(F)]
    wa = [ahead_w[0, 0, offs[k] : offs[k + 1], :].astype(dtype) for k in range(F)]
    wa.append(ahead_w[0, 0, cin_tot:, :].astype(dtype))

    def xmap_shape(shape4):
        return pl.BlockSpec((1,) + tuple(shape4[1:]), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    args: List = []
    in_specs: List = []
    c_pre_out = 0
    if pre:
        pcs = [f.shape[-1] for f in pre_features]
        poffs = np.cumsum([0] + pcs)
        c_pre_out = pre_w.shape[3]
        wp = [pre_w[0, 0, poffs[k] : poffs[k + 1], :].astype(dtype)
              for k in range(P)]
        args += list(pre_features)
        in_specs += [xmap_shape(f.shape) for f in pre_features]
        args += [pre_vec.astype(jnp.float32)] + wp
        in_specs += [full(args[len(in_specs)])] + [full(a) for a in wp]
    # feature 0 is replaced by the pre-stage output in-kernel; ship a dummy
    feat_args = list(features)
    if pre:
        feat_args[0] = jnp.zeros((n, 1, 1, 1), dtype)
    args += feat_args
    in_specs += [xmap_shape(f.shape) for f in feat_args]
    args += [bneck_vec.astype(jnp.float32)] + wb
    in_specs += [full(bneck_vec)] + [full(a) for a in wb]
    args += [vec2.astype(jnp.float32), w3.astype(dtype)]
    in_specs += [full(vec2), full(w3)]
    args += [ahead_vec.astype(jnp.float32)] + wa
    in_specs += [full(ahead_vec)] + [full(a) for a in wa]
    if skip:
        ws = [skip_w[0, 0, offs[k] : offs[k + 1], :].astype(dtype) for k in range(F)]
        ws.append(skip_w[0, 0, cin_tot:, :].astype(dtype))
        args += [skip_vec.astype(jnp.float32)] + ws
        in_specs += [full(args[len(in_specs)])] + [full(a) for a in ws]
    if head:
        wh = head_w[0, 0].astype(dtype)
        args += [head_vec.astype(jnp.float32), wh]
        in_specs += [full(args[len(in_specs)]), full(wh)]

    ah_h, ah_w = (h // 2, w // 2) if pool_ahead else (h, w)
    out_shapes = [jax.ShapeDtypeStruct((n, ah_h, ah_w, cout), dtype)]
    out_specs = [xmap_shape((n, ah_h, ah_w, cout))]
    if skip:
        out_shapes.append(jax.ShapeDtypeStruct((n, h, w, cout), dtype))
        out_specs.append(xmap_shape((n, h, w, cout)))
    if emit_layer_out:
        out_shapes.append(jax.ShapeDtypeStruct((n, h, w, g), dtype))
        out_specs.append(xmap_shape((n, h, w, g)))
    if head:
        c_head = head_w.shape[3]
        out_shapes.append(jax.ShapeDtypeStruct((n, h, w, c_head), dtype))
        out_specs.append(xmap_shape((n, h, w, c_head)))
    if pre and emit_pre_out:
        out_shapes.append(jax.ShapeDtypeStruct((n, h, w, c_pre_out), dtype))
        out_specs.append(xmap_shape((n, h, w, c_pre_out)))

    meta = dict(n_feats=F, n_pre=P, c_pre_out=c_pre_out,
                emit_pre_out=emit_pre_out,
                c_head=(head_w.shape[3] if head else 0),
                head=head, h=h, w=w, cb=cb, g=g, cout=cout, skip=skip,
                upsample_first=upsample_first, pool_ahead=pool_ahead,
                emit_layer_out=emit_layer_out, dtype=dtype)
    flops = 2 * h * w * n * (cin_tot * cb + 9 * cb * g + (cin_tot + g) * cout * (2 if skip else 1))
    outs = pl.pallas_call(
        functools.partial(_block_kernel, meta),
        grid=(n,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(f.size * f.dtype.itemsize for f in features),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the h=64 block's working set peaks ~17-25 MB; v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return outs
