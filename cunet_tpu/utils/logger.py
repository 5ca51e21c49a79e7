"""TSV metrics logger + console/file log sinks.

Behavioral rebuild of ref:utils/logger.py (tab-separated numeric log with a
header row, resume-append mode, '%.6f' floats) and the console+file halves of
ref:utils/visualizer.py:69-89 (``print_log`` / ``write_log``). The visdom /
HTML sinks of the reference are covered by cunet_tpu.utils.visualizer.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence


class TsvLogger:
    """Append one row of numbers per epoch under named columns."""

    def __init__(self, fpath: str, resume: bool = False):
        self.fpath = fpath
        self.names: List[str] = []
        self.numbers: Dict[str, List[float]] = {}
        if resume and os.path.isfile(fpath):
            with open(fpath) as f:
                header = f.readline().rstrip()
                self.names = header.split("\t")
                self.numbers = {n: [] for n in self.names}
                for line in f:
                    vals = line.rstrip().split("\t")
                    for n, v in zip(self.names, vals):
                        self.numbers[n].append(float(v))
            self.file = open(fpath, "a")
        else:
            self.file = open(fpath, "w")

    def set_names(self, names: Sequence[str]):
        if self.names:  # resumed: header already written
            return
        self.names = list(names)
        self.numbers = {n: [] for n in self.names}
        self.file.write("\t".join(self.names) + "\n")
        self.file.flush()

    def append(self, numbers: Sequence[float]):
        assert len(self.names) == len(numbers), "row length != header length"
        row = []
        for name, num in zip(self.names, numbers):
            row.append(f"{num:.6f}")
            self.numbers[name].append(float(num))
        self.file.write("\t".join(row) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class ConsoleFileLogger:
    """print + append to log.txt (ref:utils/visualizer.py:69-89)."""

    def __init__(self, log_path: Optional[str] = None, quiet: bool = False):
        self.log_path = log_path
        self.quiet = quiet

    def print_log(self, msg: str):
        if not self.quiet:
            print(msg)
        self.write_log(msg)

    def write_log(self, msg: str):
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(msg + "\n")
