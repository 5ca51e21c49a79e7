"""File/directory IO helpers + multi-experiment log aggregation.

Behavioral rebuild of ref:pylib/FileIO.py (listing, line/float readers) and
ref:utils/logger.py:84-100 (``LoggerMonitor`` multi-log plotting) on top of
the TSV logs this framework writes.
"""

from __future__ import annotations

import os
import random
import shutil
from typing import Dict, List, Sequence

import numpy as np


def list_subfolders(path: str) -> List[str]:
    return [f for f in sorted(os.listdir(path)) if os.path.isdir(os.path.join(path, f))]


def list_files(path: str, suffix: str, recursive: bool = True) -> List[str]:
    out = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(suffix):
                out.append(os.path.join(root, f))
        if not recursive:
            break
    return out


def read_lines(path: str) -> List[str]:
    with open(path) as f:
        return [line.rstrip("\n") for line in f]


def write_lines(path: str, lines: Sequence[str], shuffle: bool = False):
    lines = list(lines)
    if shuffle:
        random.shuffle(lines)
    with open(path, "w") as f:
        for line in lines:
            f.write(line + "\n")


def read_floats(path: str) -> np.ndarray:
    return np.array([[float(v) for v in line.split(" ")] for line in read_lines(path)])


def write_floats(path: str, arr: np.ndarray):
    np.savetxt(path, np.asarray(arr), fmt="%.6f")


def recreate_folder(path: str):
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)


class LoggerMonitor:
    """Aggregate several experiments' TSV summaries for comparison plots
    (ref:utils/logger.py:84-100)."""

    def __init__(self, paths: Dict[str, str]):
        from cunet_tpu.utils.logger import TsvLogger

        self.loggers = {}
        for name, p in paths.items():
            lg = TsvLogger(p, resume=True)
            lg.close()
            self.loggers[name] = lg

    def numbers(self) -> Dict[str, Dict[str, List[float]]]:
        return {name: lg.numbers for name, lg in self.loggers.items()}

    def plot(self, out_path: str, names: Sequence[str] = ("val_metric",)):
        """One comparison figure across experiments (matplotlib, Agg)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        for exp, lg in self.loggers.items():
            for col in names:
                if col in lg.numbers:
                    ax.plot(lg.numbers["epoch"], lg.numbers[col], label=f"{exp}:{col}")
        ax.set_xlabel("epoch")
        ax.legend()
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return out_path
