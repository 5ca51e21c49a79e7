"""Configuration dataclasses for the CU-Net TPU framework.

The reference drives everything through a two-tier argparse stack
(ref:options/base_options.py:12-33, ref:options/train_options.py:7-38) and —
as an anti-pattern we deliberately do NOT reproduce — parses ``sys.argv`` at
module import time for quantization bit-widths (ref:utils/quantize.py:8-11).
Here every knob is an explicit, immutable dataclass; the CLI layer constructs
these from flags.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


def _round_half_up(x: float) -> int:
    """Python-2 ``round`` semantics (round-half-away-from-zero).

    The reference computes loss anchors with Python 2's ``round``
    (ref:models/cu_net.py:278); Python 3 banker's rounding would disagree on
    exact .5 ties, so we pin the py2 behavior.
    """
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def loss_anchors(layer_num: int, loss_num: int) -> Tuple[int, ...]:
    """Uniformly spread ``loss_num`` supervision anchors over ``layer_num`` U-Nets.

    Mirrors ref:models/cu_net.py:274-283: ``anchor_j = round(K/loss_num*(j+1))``,
    keeping anchors <= layer_num; the final U-Net always carries a loss.
    Anchors are 1-indexed U-Net counts (an anchor ``a`` means the output of
    U-Net ``a-1`` gets a head).
    """
    if not (1 <= loss_num <= layer_num):
        raise ValueError(
            f"loss_num must satisfy 1 <= loss_num <= layer_num, got "
            f"loss_num={loss_num}, layer_num={layer_num}"
        )
    loss_every = float(layer_num) / float(loss_num)
    anchors = []
    for j in range(loss_num):
        a = _round_half_up(loss_every * (j + 1))
        if a <= layer_num:
            anchors.append(a)
    if layer_num not in anchors:
        raise ValueError(f"final U-Net has no loss anchor: {anchors}")
    if len(anchors) != loss_num:
        raise ValueError(f"anchor collision: {anchors}")
    return tuple(anchors)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the order-K coupled U-Net.

    Defaults follow the reference entry scripts (ref:cu-net.py:46-48:
    ``neck_size=4, growth_rate=32, init_chan_num=128``) and
    ref:options/train_options.py:7-14.
    """

    layer_num: int = 2          # K, number of coupled U-Nets
    order: int = 1              # coupling order (FIFO depth of cross-U-Net links)
    class_num: int = 16         # output heatmap channels
    loss_num: int = 2           # number of supervised anchors
    neck_size: int = 4          # bottleneck width multiplier (1x1 conv out = neck*growth)
    growth_rate: int = 32
    init_chan_num: int = 128
    num_blocks: int = 4         # down/up steps per hourglass (ref:models/cu_net.py:232)
    drop_rate: float = 0.0
    drop_impl: str = "prng"     # dropout mask source when drop_rate > 0:
                                # "prng"  — in-kernel counter-hash masks
                                #           (ops/dropmask.py): no HBM mask
                                #           stream, no host threefry cost;
                                #           fused and lax paths generate
                                #           identical bits
                                # "masks" — host-precomputed threefry masks
                                #           threaded as kernel inputs (the
                                #           r4 path; exact lax fold_in chain)
    # --- TPU-specific knobs (no reference counterpart) ---
    compute_dtype: str = "float32"   # "bfloat16" for MXU throughput
    param_dtype: str = "float32"
    remat: str = "bottleneck"        # none | bottleneck | layer | block
    use_pallas: bool = False         # dispatch fused Pallas kernels where available
    pallas_hourglass: bool = True    # whole-slot giga-kernel (vs per-block kernels)
    pallas_whole_model: bool = False # single-launch full-forward tera-kernel
    use_scan: bool = True            # lax.scan over steady-state U-Net slots
    conv3x3_impl: str = "lax"        # "lax" (conv_general) | "scatter" (fat
                                     # matmul + shifted adds; MXU-friendly N)
    bn_dtype: str = "float32"        # BN normalize dtype: "float32" (torch
                                     # parity) | "compute" (flax-style mixed
                                     # precision: f32 stats, normalize in
                                     # compute_dtype — halves the train-path
                                     # elementwise HBM traffic fwd+bwd)
    bn_tile: int = 0                 # ghost/per-replica BN: train batch-stat
                                     # group size in images (0 = whole batch).
                                     # The reference's DataParallel computes
                                     # BN per GPU shard (ref:cu-net.py:59 —
                                     # bs24 on 4 GPUs = stats over 6 images);
                                     # bn_tile reproduces that semantics and
                                     # is the stat granularity of the fused
                                     # train kernels (one grid tile = one
                                     # stat group). Running stats update with
                                     # the tile-averaged statistics.

    def __post_init__(self):
        if self.order >= self.layer_num:
            # ref:models/cu_net.py:285-287 rejects order >= layer_num
            raise ValueError(
                f"order ({self.order}) must be < layer_num ({self.layer_num})"
            )
        if self.remat not in ("none", "bottleneck", "layer", "block"):
            raise ValueError(f"unknown remat policy: {self.remat}")
        if self.conv3x3_impl not in ("lax", "scatter"):
            raise ValueError(f"unknown conv3x3_impl: {self.conv3x3_impl}")
        if self.bn_dtype not in ("float32", "compute"):
            raise ValueError(f"unknown bn_dtype: {self.bn_dtype}")
        if self.drop_impl not in ("prng", "masks"):
            raise ValueError(f"unknown drop_impl: {self.drop_impl}")
        loss_anchors(self.layer_num, self.loss_num)  # validate

    @property
    def anchors(self) -> Tuple[int, ...]:
        return loss_anchors(self.layer_num, self.loss_num)

    @property
    def bottleneck_chan(self) -> int:
        return self.neck_size * self.growth_rate


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """WAGE-style quantization bit-widths (ref:options/train_options.py:33-38).

    ``bits > 15`` disables quantization for that tensor class
    (ref:utils/quantize.py:33-42).
    """

    bits_w: int = 1
    bits_i: int = 8
    bits_g: int = 8
    enabled: bool = False
    # --- TPU-native deployment upgrade (no reference counterpart) ---
    # Real int8 MXU execution of the binarized 1x1 convs at inference: the
    # reference only SIMULATES low-bit (fp32 GEMMs on dequantized values,
    # ref:utils/quantize.py:127-149). Activations are additionally quantized
    # to bits_i at every 1x1 conv input (the reference quantizes only before
    # 3x3 convs and heads), so this is a documented approximation mode.
    int8_infer: bool = False
    int8_impl: str = "pallas"   # "pallas" (MXU int8 kernel) | "lax" (oracle)

    def __post_init__(self):
        if self.int8_infer:
            if self.bits_w != 1:
                raise ValueError("int8_infer requires binarized weights (bits_w=1)")
            if not (2 < self.bits_i <= 8):
                raise ValueError("int8_infer requires 3..8 activation bits")
            if self.int8_impl not in ("pallas", "lax"):
                raise ValueError(f"unknown int8_impl: {self.int8_impl}")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization recipe (ref:cu-net.py:60-61, ref:options/train_options.py)."""

    lr: float = 2.5e-4
    rmsprop_alpha: float = 0.99
    rmsprop_eps: float = 1e-8
    batch_size: int = 24
    n_epochs: int = 200
    schedule: str = "mpii"      # "mpii" (x0.2@101,x0.5@141,x0.5@161) | "face" (@30/60/90) | "none"
    print_freq: int = 10
    seed: int = 0
    # --- parallelism (TPU-native; reference used single-proc DataParallel) ---
    dp: int = 1                 # data-parallel mesh size
    sp: int = 1                 # spatial-partition mesh size (shards H)
