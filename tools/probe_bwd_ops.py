"""Dev-only: compile-probe individual train-slot BWD sub-ops on real TPU.

Each probe is a tiny pallas_call at real dims (h=64, c=128) containing ONE
suspect op pattern from _slot_bwd_kernel. Run variants in subprocesses so a
Mosaic failure doesn't kill the sweep:

    python tools/probe_bwd_ops.py [probe ...]
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD_PRELUDE = r"""
import sys; sys.path.insert(0, %r)
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT, H, C, CB, G = %d, 64, 128, 128, 32
M = BT * H * H
DT = jnp.bfloat16


def run(kernel, args, out_shapes):
    outs = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(a.shape,
                               (lambda nd: lambda i: (0,) * nd)(a.ndim),
                               memory_space=pltpu.VMEM) for a in args],
        out_specs=tuple(
            pl.BlockSpec(s.shape,
                         (lambda nd: lambda i: (0,) * nd)(len(s.shape)),
                         memory_space=pltpu.VMEM) for s in out_shapes),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(*args)
    return outs
"""

PROBES = {
    # conv3x3 bwd as committed: concat of 9 shifted slices -> 2 fat dots
    "conv_cat": r"""
from cunet_tpu.kernels.train_slot import _conv3x3_bwd

def k(z2_ref, w3_ref, do_ref, o1, o2):
    z2 = z2_ref[...].reshape(M, CB)
    d_z2, dW3 = _conv3x3_bwd(z2, w3_ref[...], do_ref[...].reshape(M, G),
                             BT, H, H, DT)
    o1[...] = d_z2.reshape(BT, H, H, CB)
    o2[...] = dW3

outs = run(k, [jnp.ones((BT, H, H, CB), DT), jnp.ones((CB, 9 * G), DT),
               jnp.ones((BT, H, H, G), DT)],
           [jax.ShapeDtypeStruct((BT, H, H, CB), jnp.float32),
            jax.ShapeDtypeStruct((CB, 9 * G), jnp.float32)])
print("OK", float(outs[0][0, 0, 0, 0]))
""",
    # concat-free conv3x3 bwd: 9 per-tap dots, dW3 built by last-dim concat
    "conv_taps": r"""
def k(z2_ref, w3_ref, do_ref, o1, o2):
    z2 = z2_ref[...].reshape(M, CB)
    w3p = w3_ref[...]
    d_p = jnp.pad(do_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    d_z2 = jnp.zeros((M, CB), jnp.float32)
    dW3_parts = []
    for dy in range(3):
        for dx in range(3):
            d = dy * 3 + dx
            sl = d_p[:, 2 - dy:2 - dy + H, 2 - dx:2 - dx + H, :]
            sl = sl.astype(jnp.float32).reshape(M, G).astype(DT)
            wcol = w3p[:, d * G:(d + 1) * G]
            d_z2 = d_z2 + jax.lax.dot_general(
                sl, wcol, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dW3_parts.append(jax.lax.dot_general(
                z2, sl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    o1[...] = d_z2.reshape(BT, H, H, CB)
    o2[...] = jnp.concatenate(dW3_parts, axis=-1)

outs = run(k, [jnp.ones((BT, H, H, CB), DT), jnp.ones((CB, 9 * G), DT),
               jnp.ones((BT, H, H, G), DT)],
           [jax.ShapeDtypeStruct((BT, H, H, CB), jnp.float32),
            jax.ShapeDtypeStruct((CB, 9 * G), jnp.float32)])
print("OK", float(outs[0][0, 0, 0, 0]))
""",
    # cat-form conv bwd with per-slice canonicalization (split-reconcat on
    # lanes) before the tap concat -> two fat dots (K=9G on the MXU)
    "conv_cat_canon": r"""
def k(z2_ref, w3_ref, do_ref, o1, o2):
    z2 = z2_ref[...].reshape(M, CB)
    w3p = w3_ref[...]
    d_p = jnp.pad(do_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        for dx in range(3):
            sl = d_p[:, 2 - dy:2 - dy + H, 2 - dx:2 - dx + H, :].reshape(M, G)
            taps.append(jnp.concatenate([sl[:, :G // 2], sl[:, G // 2:]],
                                        axis=-1))
    d_t = jnp.concatenate(taps, axis=-1)
    o1[...] = jax.lax.dot_general(
        d_t.astype(DT), w3p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(BT, H, H, CB)
    o2[...] = jax.lax.dot_general(
        z2, d_t.astype(DT), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

outs = run(k, [jnp.ones((BT, H, H, CB), DT), jnp.ones((CB, 9 * G), DT),
               jnp.ones((BT, H, H, G), DT)],
           [jax.ShapeDtypeStruct((BT, H, H, CB), jnp.float32),
            jax.ShapeDtypeStruct((CB, 9 * G), jnp.float32)])
print("OK", float(outs[0][0, 0, 0, 0]))
""",
    # cat-form via pad-on-channels + sum (fwd-style adds, no concat)
    "conv_pad_sum": r"""
def k(z2_ref, w3_ref, do_ref, o1, o2):
    z2 = z2_ref[...].reshape(M, CB)
    w3p = w3_ref[...]
    d_p = jnp.pad(do_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    d_t = None
    for dy in range(3):
        for dx in range(3):
            d = dy * 3 + dx
            sl = d_p[:, 2 - dy:2 - dy + H, 2 - dx:2 - dx + H, :]
            term = jnp.pad(sl, ((0, 0), (0, 0), (0, 0),
                                (d * G, (8 - d) * G)))
            d_t = term if d_t is None else d_t + term
    d_t = d_t.reshape(M, 9 * G)
    o1[...] = jax.lax.dot_general(
        d_t.astype(DT), w3p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(BT, H, H, CB)
    o2[...] = jax.lax.dot_general(
        z2, d_t.astype(DT), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

outs = run(k, [jnp.ones((BT, H, H, CB), DT), jnp.ones((CB, 9 * G), DT),
               jnp.ones((BT, H, H, G), DT)],
           [jax.ShapeDtypeStruct((BT, H, H, CB), jnp.float32),
            jax.ShapeDtypeStruct((CB, 9 * G), jnp.float32)])
print("OK", float(outs[0][0, 0, 0, 0]))
""",
    # channel split of a wide fp32 at non-128 offsets + slice ref writes
    "chan_split": r"""
K1 = 2 * C + G  # 288

def k(x_ref, o1, o2, o3):
    x = x_ref[...].reshape(M, K1 + G)
    d_cat = x[:, :K1]
    d_o32 = x[:, K1:]
    o1[...] = d_cat[:, :2 * C].reshape(BT, H, H, 2 * C)
    o2[...] = d_cat[:, 2 * C:].astype(DT).reshape(BT, H, H, G)
    o3[...] = d_o32.reshape(BT, H, H, G)

outs = run(k, [jnp.ones((BT, H, H, K1 + G), jnp.float32)],
           [jax.ShapeDtypeStruct((BT, H, H, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((BT, H, H, G), DT),
            jax.ShapeDtypeStruct((BT, H, H, G), jnp.float32)])
print("OK", float(outs[0][0, 0, 0, 0]))
""",
    # upsample bwd: 2x2 replica sum at low res
    "ups_bwd": r"""
from cunet_tpu.kernels.train_slot import _upsample_bwd

def k(d_ref, o1):
    d = d_ref[...].reshape(BT * H * H, C)
    o1[...] = _upsample_bwd(d, H // 2, H // 2, BT, C).reshape(
        BT, H // 2, H // 2, C)

outs = run(k, [jnp.ones((BT, H, H, C), DT)],
           [jax.ShapeDtypeStruct((BT, H // 2, H // 2, C), jnp.float32)])
print("OK", float(outs[0][0, 0, 0, 0]))
""",
    # one full up-block bwd at h=64 dims (the stub_after=1 step) minus head
    "block64": r"""
from cunet_tpu.kernels.train_slot import (
    _affine_bwd, _conv3x3_bwd, _dot, _dot_dw, _dot_dx, _norm_relu,
    _stage_bwd, _upsample2_cat, _upsample_bwd)

K1 = 2 * C + G
K2 = K1 + G

def k(up_ref, skip_ref, fifo_ref, bn1_ref, wb_ref, bn2_ref, w3_ref,
      bna_ref, wa_ref, st1_ref, st2_ref, sta_ref, dy_ref,
      o_dup, o_dskip, o_dfifo, o_dwb, o_dw3, o_dwa):
    eps = 1e-5
    up = _upsample2_cat(up_ref[...].reshape(BT * (H // 2) ** 2, C),
                        H // 2, H // 2, BT)
    skip = skip_ref[...].reshape(M, C)
    fifo = fifo_ref[...].reshape(M, G)
    x_cat = jnp.concatenate([up, skip, fifo], axis=-1)
    st1, st2, sta = st1_ref[0], st2_ref[0], sta_ref[0]
    z1 = _norm_relu(x_cat, bn1_ref[...], st1[0], st1[1], DT, eps)
    yb = _dot(z1, wb_ref[...], DT).astype(DT)
    z2 = _norm_relu(yb, bn2_ref[...], st2[0], st2[1], DT, eps)
    from cunet_tpu.kernels.fused_hourglass import _conv3x3
    out32 = _conv3x3(z2, w3_ref[...], BT, H, H, mode="scatter").astype(DT)
    x2 = jnp.concatenate([x_cat, out32], axis=-1)
    d_ahead = dy_ref[...].reshape(M, C).astype(jnp.float32)
    d_x2, dW_a, dbn_a = _stage_bwd(x2, bna_ref[...], wa_ref[...],
                                   sta[0], sta[1], d_ahead, DT, eps)
    d_x_cat = d_x2[:, :K1]
    d_out32 = d_x2[:, K1:]
    d_z2, dW3 = _conv3x3_bwd(z2, w3_ref[...], d_out32, BT, H, H, DT)
    d_yb, _ = _affine_bwd(yb, bn2_ref[...], st2[0], st2[1], d_z2, DT, eps)
    dW_b = _dot_dw(z1, d_yb, DT)
    d_z1 = _dot_dx(d_yb, wb_ref[...], DT)
    d_x1, _ = _affine_bwd(x_cat, bn1_ref[...], st1[0], st1[1], d_z1, DT, eps)
    d_all = d_x_cat + d_x1
    o_dfifo[...] = d_all[:, 2 * C:].astype(DT).reshape(BT, H, H, G)
    d_up_hi = d_all[:, :C]
    o_dskip[...] = d_all[:, C:2 * C].astype(DT).reshape(BT, H, H, C)
    o_dup[...] = _upsample_bwd(d_up_hi, H // 2, H // 2, BT, C).reshape(
        BT, H // 2, H // 2, C)
    o_dwb[...] = dW_b
    o_dw3[...] = dW3
    o_dwa[...] = dW_a

outs = run(k, [jnp.ones((BT, H // 2, H // 2, C), DT),
               jnp.ones((BT, H, H, C), DT),
               jnp.ones((BT, H, H, G), DT),
               jnp.ones((2, K1), jnp.float32), jnp.ones((K1, CB), DT),
               jnp.ones((2, CB), jnp.float32), jnp.ones((CB, 9 * G), DT),
               jnp.ones((2, K2), jnp.float32), jnp.ones((K2, C), DT),
               jnp.ones((1, 2, K1), jnp.float32),
               jnp.ones((1, 2, CB), jnp.float32),
               jnp.ones((1, 2, K2), jnp.float32),
               jnp.ones((BT, H, H, C), DT)],
          [jax.ShapeDtypeStruct((BT, H // 2, H // 2, C), jnp.float32),
           jax.ShapeDtypeStruct((BT, H, H, C), DT),
           jax.ShapeDtypeStruct((BT, H, H, G), DT),
           jax.ShapeDtypeStruct((K1, CB), jnp.float32),
           jax.ShapeDtypeStruct((CB, 9 * G), jnp.float32),
           jax.ShapeDtypeStruct((K2, C), jnp.float32)])
print("OK", float(outs[0][0, 0, 0, 0]))
""",
}


def run_probe(name: str, bt: int) -> None:
    src = CHILD_PRELUDE % (HERE, bt) + PROBES[name]
    r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                       text=True, timeout=900)
    ok = r.returncode == 0 and "OK" in r.stdout
    err = ""
    if not ok:
        for line in (r.stderr + r.stdout).splitlines():
            if "Mosaic failed" in line or "RESOURCE_EXHAUSTED" in line:
                err = line.strip()[:240]
                break
        if not err:
            err = "\n".join((r.stderr + r.stdout).splitlines()[-6:])
    print(f"[bt={bt}] {name}: {'OK ' + r.stdout.strip()[:40] if ok else 'FAIL ' + err}",
          flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        run_probe(n, 2)
