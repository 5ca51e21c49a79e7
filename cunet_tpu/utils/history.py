"""Epoch-indexed training history with best-metric tracking.

Behavioral rebuild of ref:utils/util.py:8-86 (``TrainHistory`` /
``TrainHistoryFace``). The two reference classes differ only in metric name
and direction (val_pckh max vs. val_rmse min); one class with a ``mode``
covers both. JSON-serializable for checkpointing.
"""

from __future__ import annotations

from typing import Dict, List


class TrainHistory:
    """mode='max' tracks val_pckh-style metrics (higher better,
    best init 0.0); mode='min' tracks val_rmse-style (lower better,
    best init 1.0) — matching the reference's initial values."""

    def __init__(self, mode: str = "max", metric_name: str = "val_pckh"):
        if mode not in ("max", "min"):
            raise ValueError(f"mode must be max|min, got {mode}")
        self.mode = mode
        self.metric_name = metric_name
        self.epoch: List[Dict] = []
        self.lr: List[Dict] = []
        self.loss: List[Dict] = []
        self.metric: List[Dict] = []
        self.best_metric = 0.0 if mode == "max" else 1.0
        self.is_best = True

    def update(self, epoch: Dict, lr: Dict, loss: Dict, metric: Dict):
        self.epoch.append(dict(epoch))
        self.lr.append(dict(lr))
        self.loss.append(dict(loss))
        self.metric.append(dict(metric))
        val = metric[self.metric_name]
        if self.mode == "max":
            self.is_best = val > self.best_metric
            self.best_metric = max(val, self.best_metric)
        else:
            self.is_best = val < self.best_metric
            self.best_metric = min(val, self.best_metric)

    @property
    def last_epoch(self) -> int:
        return self.epoch[-1]["epoch"] if self.epoch else 0

    @property
    def last_lr(self) -> float:
        return self.lr[-1]["lr"] if self.lr else 0.0

    def state_dict(self) -> Dict:
        return {
            "mode": self.mode,
            "metric_name": self.metric_name,
            "epoch": self.epoch,
            "lr": self.lr,
            "loss": self.loss,
            "metric": self.metric,
            "best_metric": self.best_metric,
            "is_best": self.is_best,
        }

    def load_state_dict(self, d: Dict):
        self.mode = d["mode"]
        self.metric_name = d["metric_name"]
        self.epoch = d["epoch"]
        self.lr = d["lr"]
        self.loss = d["loss"]
        self.metric = d["metric"]
        self.best_metric = d["best_metric"]
        self.is_best = d["is_best"]


class AverageMeter:
    """Running value/avg/sum/count meter (ref:utils/util.py:89-104)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
