"""Per-part PCKh table and coordinate-space PCKh.

Behavioral rebuild of ref:pylib/HumanAcc.py: ``approx_PCKh`` (coords-based,
norm = res/10, ref:pylib/HumanAcc.py:7-44) and the full per-part PCKh table
(Head/Knee/Ankle/Shoulder/Elbow/Wrist/Hip pairs, ref:pylib/HumanAcc.py:46-95).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from cunet_tpu.evaluation.decode import calc_dists, dist_acc

MPII_PART_PAIRS: Tuple[Tuple[str, Tuple[int, int]], ...] = (
    ("Head", (8, 9)),
    ("Knee", (1, 4)),
    ("Ankle", (0, 5)),
    ("Shoulder", (12, 13)),
    ("Elbow", (11, 14)),
    ("Wrist", (10, 15)),
    ("Hip", (2, 3)),
)


def approx_pckh(pred, target, idxs: Sequence[int], res: int, thr: float = 0.5) -> float:
    """Coords-based PCK with norm = res/10 (ref:pylib/HumanAcc.py:7-44)."""
    norm = np.full(pred.shape[0], res / 10.0)
    dists = calc_dists(np.asarray(pred, float), np.asarray(target, float), norm)
    accs = [dist_acc(dists[i], thr) for i in idxs]
    good = [a for a in accs if a >= 0]
    return float(sum(good) / len(good)) if good else -1.0


def pckh_table(pred, target, normalizer, thr: float = 0.5) -> Dict[str, float]:
    """Full PCKh: per-joint accs -> per-part pairs + average
    (ref:pylib/HumanAcc.py:46-95). Returns {'Head': ..., ..., 'Average': ...}."""
    pred = np.asarray(pred, float)
    target = np.asarray(target, float)
    dists = calc_dists(pred, target, np.asarray(normalizer, float))
    pts_num = target.shape[1]
    pckhs = np.array([dist_acc(dists[i], thr) for i in range(pts_num)])
    good = pckhs[pckhs >= 0]
    table = {
        name: float((pckhs[a] + pckhs[b]) / 2) for name, (a, b) in MPII_PART_PAIRS
    }
    table["Average"] = float(good.mean()) if good.size else -1.0
    return table


def format_pckh_table(table: Dict[str, float]) -> str:
    lines = [f"{name}: {table[name]:.4f}" for name, _ in MPII_PART_PAIRS]
    lines.append(f"Average PCKh is: {table['Average']:.4f}")
    return "\n".join(lines)
