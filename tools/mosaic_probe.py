"""Per-op Mosaic cost probes for the tera-kernel's elementwise passes.

Looped microbenchmarks are invalid inside Mosaic kernels (loop-invariant
dots/ops hoist), so every probe is a DEPENDENCY CHAIN: y = f(y) repeated P
times cannot be hoisted or CSE'd. Timing the chain at two depths (P_hi,
P_lo) and taking the slope isolates the per-op cost from launch/stream
overhead. The input block varies per grid step so nothing is grid-invariant.

Outputs a table of ns/op and effective VMEM bytes/s per op kind — the
constants that calibrate the tera-kernel pass-cost model in PARITY.md.

Usage (TPU):  timeout 600 python tools/mosaic_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1024          # rows per grid step
GRID = 32            # grid steps per launch
# Chain depths. Two lessons from the first on-chip run (r4 sweep,
# /tmp/r4sweep/probe_core.log): (1) shallow chains (P=16) hide entirely
# under the per-block HBM stream (all per-op costs came out NEGATIVE —
# grid-step DMA overlaps compute, so light VPU work is free); (2) chains of
# constant ops (y*c, max(y,c), bf16 round-trips) are algebraically
# composable, so the backend may fold them to depth 1. Fix: measure the
# SLOPE between two deep depths (both far above the DMA floor) of chains
# built around the quadratic map y <- 0.5*y*y + 0.1 (converges to the
# stable fixed point ~0.106; no closed form, cannot fold).
P_HI = 96
P_LO = 24


def _quad(y):
    return y * y * 0.5 + 0.1


# ops per chain step: the quadratic anti-fold core is 3 VPU ops (mul, mul,
# add); each kind appends its priced op(s) on top.
_STEP_OPS = {
    "quad": 3,           # the bare core: prices the generic VPU-op constant
    "quad_max": 4,       # + elementwise max (relu class)
    "quad_affine_vec": 5,    # + (1,C)-broadcast mul+add (BN affine class)
    "quad_cast2": 5,     # + f32->bf16->f32 round trip (2 cast ops)
    "quad_roll_lane": 4,     # + lane roll (misaligned lane slice analog)
    "quad_roll_sub": 4,      # + sublane roll (dx conv-tap shift analog)
}


def _op(kind, y):
    z = _quad(y)
    if kind == "quad":
        return z
    if kind == "quad_max":
        return jnp.maximum(z, 0.103)
    if kind == "quad_affine_vec":
        v = jnp.full((1, y.shape[-1]), 1.0001, y.dtype)
        b = jnp.full((1, y.shape[-1]), 0.0001, y.dtype)
        return z * v + b
    if kind == "quad_cast2":
        return z.astype(jnp.bfloat16).astype(jnp.float32) if \
            y.dtype == jnp.float32 else z.astype(jnp.float32).astype(y.dtype)
    if kind == "quad_roll_lane":
        return jnp.roll(z, 32, axis=-1)
    if kind == "quad_roll_sub":
        return jnp.roll(z, 1, axis=0)
    raise ValueError(kind)


def _chain_kernel(kind, P, x_ref, o_ref):
    y = x_ref[...]
    for _ in range(P):
        y = _op(kind, y)
    o_ref[...] = y


def run(kind, P, lanes, dtype, iters=20):
    x = (jnp.ones((GRID * ROWS, lanes), dtype) * 0.5)
    fn = pl.pallas_call(
        functools.partial(_chain_kernel, kind, P),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, lanes), dtype),
    )
    f = jax.jit(lambda x: jnp.sum(fn(x).astype(jnp.float32)))
    s = float(f(x))  # compile+warm
    assert np.isfinite(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(x)
    float(r)  # fetch forces the queue through the axon relay
    return (time.perf_counter() - t0) / iters


_QUAD_SLOPE = {}


def probe(kind, lanes=256, dtype=jnp.float32):
    """Prices ONE op of ``kind``'s extra class: chain-slope between P_HI and
    P_LO, minus the quadratic core's own slope (measured once per
    lanes/dtype). lanes >= 128 only — narrower out blocks hit jax 0.9's
    unimplemented value dynamic_update_slice lowering."""
    key = (lanes, np.dtype(dtype).name)
    slope = (run(kind, P_HI, lanes, dtype)
             - run(kind, P_LO, lanes, dtype)) / (P_HI - P_LO)
    if key not in _QUAD_SLOPE:
        _QUAD_SLOPE[key] = slope if kind == "quad" else (
            run("quad", P_HI, lanes, dtype)
            - run("quad", P_LO, lanes, dtype)) / (P_HI - P_LO)
    per_op = slope if kind == "quad" else slope - _QUAD_SLOPE[key]
    n_ops = 3 if kind == "quad" else _STEP_OPS[kind] - 3
    per_op /= n_ops
    n_el = GRID * ROWS * lanes
    bsz = np.dtype(dtype).itemsize
    gbps = 2 * n_el * bsz / per_op / 1e9 if per_op > 0 else float("inf")
    print(f"{kind:16s} lanes={lanes:4d} {np.dtype(dtype).name:8s} "
          f"per-op {per_op*1e6:8.1f} us  rw-bw {gbps:8.0f} GB/s  "
          f"({per_op/ (GRID*ROWS) *1e9:6.2f} ns/row)", flush=True)
    return per_op


def _overlap_kernel(n_dots, n_vpu, x_ref, w_ref, z_ref, o_ref, oz_ref):
    """n_dots chained (rows,512)@(512,512) dots + n_vpu chained elementwise
    ops on an INDEPENDENT buffer. If Mosaic/the core overlaps MXU and VPU,
    t(both) ~ max(t(dots), t(vpu)); if passes serialize, t ~ sum."""
    y = x_ref[...]
    z = z_ref[...]
    w = w_ref[...]
    for i in range(max(n_dots, n_vpu)):
        if i < n_dots:
            y = jax.lax.dot_general(
                y, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        if i < n_vpu:
            z = jnp.maximum(z * 1.0001 + 0.0001, 0.000123)
    o_ref[...] = y
    oz_ref[...] = z


def overlap_probe(n_dots, n_vpu, iters=20):
    rows, k, zr, zl = 512, 512, 2048, 512
    x = jnp.full((GRID * rows, k), 0.01, jnp.bfloat16)
    w = (jnp.eye(k) * 0.99).astype(jnp.bfloat16)
    z = jnp.full((GRID * zr, zl), 0.5, jnp.float32)
    fn = pl.pallas_call(
        functools.partial(_overlap_kernel, n_dots, n_vpu),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((rows, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((zr, zl), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((rows, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((zr, zl), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((GRID * rows, k), jnp.bfloat16),
                   jax.ShapeDtypeStruct((GRID * zr, zl), jnp.float32)],
        # double-buffered blocks total ~17.5 MB — above the 16 MB default
        # scoped-vmem cap (v5e VMEM is 128 MB; the product kernels set this
        # too, see kernels/fused_model_buf.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    f = jax.jit(lambda x, w, z: sum(
        jnp.sum(o.astype(jnp.float32)) for o in fn(x, w, z)))
    s = float(f(x, w, z))
    assert np.isfinite(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(x, w, z)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"dots={n_dots:2d} vpu={n_vpu:2d}: {dt*1e6:9.1f} us", flush=True)
    return dt


def main():
    import sys
    sel = sys.argv[1:] or ["core"]
    print(f"device: {jax.devices()[0].device_kind}; "
          f"block rows={ROWS} grid={GRID} depths={P_LO}/{P_HI}", flush=True)
    if "core" in sel:
        for kind in ["quad", "quad_max", "quad_cast2",
                     "quad_roll_lane", "quad_roll_sub"]:
            probe(kind)
    if "width" in sel:
        probe("quad", lanes=128)
        probe("quad", dtype=jnp.bfloat16)
    if "extra" in sel:
        probe("quad_affine_vec")
    if "overlap" in sel:
        # legs sized to take comparable time (bf16 512^3 dot ~= 0.27 GFLOP;
        # one vpu chain step = 1M f32 FMAs on the independent buffer), so
        # t(both) ~ max(t_mxu, t_vpu) vs ~ sum is unambiguous
        overlap_probe(0, 0)    # skeleton (launch + HBM streams)
        overlap_probe(12, 0)   # MXU only
        overlap_probe(0, 56)   # VPU only
        overlap_probe(12, 56)  # both: max => overlap, sum => serial


if __name__ == "__main__":
    main()
