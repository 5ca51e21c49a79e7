"""Counter-based dropout-mask PRNG shared by the lax path and the Pallas
train kernels.

The reference trains with optional dense-layer dropout on each 3x3 conv
output (ref:models/cu_net.py:63-64). Round 4 threaded host-precomputed
threefry masks through the fused train kernels as extra inputs — correct,
but it streams ~134 MB/step of mask bytes from HBM and the threefry
generation of ~67M samples costs ~22 ms on v5e (PARITY.md r4). This module
replaces the stream with IN-KERNEL generation: a stateless counter hash
(murmur3's fmix32 finalizer over a position counter) computed with plain
int32 vector ops.

Why a software hash instead of ``pltpu.prng_random_bits``: the hash is pure
jnp, so the SAME function runs inside Mosaic kernels, inside interpret-mode
kernels (jax 0.9's TPU-interpret stubs the hardware PRNG to zeros), and in
the plain-XLA lax path — fused-vs-lax dropout stays bit-identical and fully
CPU-testable. Cost is ~8 VPU int ops per mask sample (<1 ms/step at the
flagship shapes) against the deleted 134 MB of HBM traffic.

Determinism contract: a mask element depends only on
(seed, traversal position, grid tile index, flat element index) — the fwd
kernel and both recompute-backward kernels regenerate identical masks with
no saved state, and the lax oracle reproduces them tile-by-tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# murmur3 fmix32 multipliers and the 32-bit golden ratio, as wrapped int32
# literals (python ints pre-wrapped so jnp.int32() never overflow-raises)
_M1 = 0x85EBCA6B - (1 << 32)
_M2 = 0xC2B2AE35 - (1 << 32)
_GOLD = 0x9E3779B9 - (1 << 32)


def _fmix32(h):
    """murmur3 finalizer: full-avalanche bijection on int32 (wrapping
    multiplies — XLA/Mosaic int32 semantics)."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(_M1)
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(_M2)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def derive_seed(rng) -> jnp.ndarray:
    """Per-slot int32 seed (shape (1,)) from a JAX PRNG key. One scalar
    threefry draw — the per-sample generation happens downstream in the
    hash, so this is the only host-PRNG cost of a dropout step."""
    return jax.random.bits(rng, (1,), "uint32").astype(jnp.int32)


def fold_seed(seed, pos, t):
    """Mix (seed, traversal position, grid tile) into one well-mixed int32.
    ``seed``/``t`` may be traced scalars (e.g. ``pl.program_id``)."""
    k = _fmix32(jnp.int32(seed) ^ (jnp.int32(_GOLD) * jnp.int32(pos + 1)))
    return _fmix32(k ^ (jnp.int32(_M1) * (jnp.int32(t) + 1)))


def keep_threshold(rate: float) -> int:
    """31-bit keep threshold: element kept iff (bits & 0x7FFFFFFF) < this.
    Bias vs the exact Bernoulli(1-rate) is <= 2^-31."""
    if not 0.0 < rate < 1.0:
        raise ValueError(f"drop rate must be in (0, 1), got {rate}")
    return min(int((1.0 - rate) * (1 << 31)), (1 << 31) - 1)


def tile_mask(seed, pos: int, t, rows: int, lanes: int, rate: float, dtype):
    """Scaled dropout mask {0, 1/keep} for one grid tile, shape
    (rows, lanes). Pure jnp — identical bits inside Mosaic kernels,
    interpret-mode kernels, and plain XLA."""
    idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
           * jnp.int32(lanes)
           + jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1))
    h = _fmix32(idx ^ fold_seed(seed, pos, t))
    u = h & jnp.int32(0x7FFFFFFF)
    keep = 1.0 - rate
    m = jnp.where(u < jnp.int32(keep_threshold(rate)),
                  jnp.float32(1.0 / keep), jnp.float32(0.0))
    return m.astype(dtype)


def batch_mask(seed, pos: int, shape, bt: int, rate: float, dtype):
    """Full-batch mask (n, h, w, c) assembled tile-by-tile so the lax path
    reproduces the fused kernels' per-grid-tile generation exactly.
    ``bt`` = images per grid tile (cfg.bn_tile); 0 falls back to the whole
    batch (single tile — the lax-only configuration)."""
    n, h, w, c = shape
    bt = bt or n
    assert n % bt == 0, f"batch {n} not divisible by mask tile {bt}"
    rows = bt * h * w
    tiles = [tile_mask(seed, pos, t, rows, c, rate, dtype).reshape(
        bt, h, w, c) for t in range(n // bt)]
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=0)
