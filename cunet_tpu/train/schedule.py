"""Epoch-indexed LR schedules matching the reference.

ref:utils/util.py:106-119 (``adjust_lr``, MPII/LSP): x0.2 at epoch 101,
x0.5 at 141, x0.5 at 161. ref:utils/util.py:121-134 (``AdjustLR``, face):
x0.2 at 30, x0.5 at 60, x0.5 at 90. Epochs are 1-indexed and the decay is
applied *at* the listed epoch and persists after.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

MPII_DECAYS: Tuple[Tuple[int, float], ...] = ((101, 0.2), (141, 0.5), (161, 0.5))
FACE_DECAYS: Tuple[Tuple[int, float], ...] = ((30, 0.2), (60, 0.5), (90, 0.5))

_SCHEDULES: Dict[str, Tuple[Tuple[int, float], ...]] = {
    "mpii": MPII_DECAYS,
    "face": FACE_DECAYS,
    "none": (),
}


def lr_at_epoch(base_lr: float, epoch: int, schedule: str = "mpii") -> float:
    """Learning rate for a 1-indexed ``epoch`` under a named schedule."""
    decays = _SCHEDULES[schedule]
    lr = base_lr
    for at, mult in decays:
        if epoch >= at:
            lr *= mult
    return lr


def epoch_boundaries(schedule: str) -> Sequence[int]:
    return [at for at, _ in _SCHEDULES[schedule]]
