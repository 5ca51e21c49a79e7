"""Epoch-level train / validate orchestration.

Behavioral rebuild of the trainer bodies (ref:cu-net.py:36-278 for
MPII/LSP, ref:cu-net-face-prev-version.py for 300-W): per-epoch LR decay,
per-batch heatmap-space PCK + origin-resolution PCKh (or face NME), flip-test
ensembling on validation, prediction accumulation by dataset index, TSV
logging, best-checkpoint tracking.

TPU shape: one jitted (optionally sharded) step; host-side numpy only for
the decode metrics, matching the reference's CPU metric path
(ref:cu-net.py:191-196).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from cunet_tpu.config import ModelConfig, QuantConfig
from cunet_tpu.evaluation import (
    MPII_ORIGIN_IDX,
    MPII_TRAIN_IDX,
    accuracy,
    accuracy_origin_res,
    final_preds,
    per_image_nme,
)
from cunet_tpu.geometry import MPII_FLIP_PAIRS, flip_test_merge
from cunet_tpu.models import apply_cu_net
from cunet_tpu.train.loss import intermediate_mse
from cunet_tpu.utils import AverageMeter, ConsoleFileLogger, StepTimer


def train_epoch(
    step_fn,
    state,
    loader,
    epoch: int,
    *,
    log: Optional[ConsoleFileLogger] = None,
    print_freq: int = 10,
    task: str = "mpii",
):
    """One optimization epoch; returns (state, avg_loss, avg_pckh_origin).

    Mirrors ref:cu-net.py:147-206: per-batch loss + heatmap PCK + origin-res
    PCKh meters, periodic logging — plus the data/step time split of the
    face trainer's meters (ref:cu-net-face-prev-version.py:143-156).
    """
    losses, pckhs, pckhs_origin = AverageMeter(), AverageMeter(), AverageMeter()
    timer = StepTimer()
    t0 = time.time()
    n_batches = len(loader)
    for i, batch in enumerate(loader):
        timer.data_ready()
        device_batch = {"image": batch["image"], "heatmap": batch["heatmap"]}
        state, metrics = step_fn(state, device_batch)
        loss = float(metrics["loss"])  # scalar fetch synchronizes the step
        timer.step_done()
        out = np.asarray(metrics["last_out"], np.float32)
        losses.update(loss)
        if task == "mpii":
            # reference idx lists are 16-joint MPII; generalize otherwise
            c = out.shape[3]
            idxs = MPII_TRAIN_IDX if c == 16 else list(range(c))
            o_idxs = MPII_ORIGIN_IDX if c == 16 else list(range(c))
            acc = accuracy(out, batch["heatmap"], idxs)
            pckhs.update(float(acc[0]))
            acc_o = accuracy_origin_res(
                out, batch["center"], batch["scale"], [out.shape[2], out.shape[1]],
                batch["pts"], batch["normalizer"], batch["rot"], idxs=o_idxs,
            )
            pckhs_origin.update(float(acc_o[0]))
        else:  # face: train-time NME on decoded crops (ref face trainer)
            preds = final_preds(
                out, batch["center"], batch["scale"],
                [out.shape[2], out.shape[1]], batch["rot"],
            )
            nme = float(np.sum(per_image_nme(preds, batch["pts"])) / out.shape[0])
            pckhs_origin.update(nme)
        if log and (i % print_freq == 0 or i == n_batches - 1):
            log.print_log(
                f"epoch {epoch} [{i}/{n_batches}] time {time.time()-t0:.1f}s "
                f"({timer.summary()}) loss {losses.avg:.6f} "
                f"pckh {pckhs.avg:.4f} metric_origin {pckhs_origin.avg:.4f}"
            )
    return state, losses.avg, pckhs_origin.avg


def validate_epoch(
    params,
    bn_state,
    loader,
    *,
    cfg: ModelConfig,
    quant: Optional[QuantConfig] = None,
    flip_test: bool = True,
    flip_pairs=MPII_FLIP_PAIRS,
    task: str = "mpii",
    num_val: Optional[int] = None,
    log: Optional[ConsoleFileLogger] = None,
    eval_fn=None,
):
    """Full validation pass with flip-test ensembling (ref:cu-net.py:209-278).

    Returns (avg_loss, avg_metric, predictions[num_val, L, 2]).
    metric = origin-res PCKh (mpii) or inter-ocular NME (face).
    """
    if eval_fn is None:
        def eval_fn(params, bn_state, image):
            outs, _ = apply_cu_net(
                params, bn_state, image, cfg=cfg, train=False, quant=quant
            )
            return outs

        eval_fn = jax.jit(eval_fn)

    losses, metrics_meter = AverageMeter(), AverageMeter()
    predictions = None
    for batch in loader:
        image = batch["image"]
        outs = eval_fn(params, bn_state, image)
        loss = float(intermediate_mse(outs, batch["heatmap"]))
        losses.update(loss)
        out = np.asarray(outs[-1], np.float32)

        # flip table only applies when the class count covers its indices
        if flip_test and int(np.max(flip_pairs)) < out.shape[3]:
            flipped = image[:, :, ::-1, :]  # W-mirror, NHWC (ref :241-242)
            outs2 = eval_fn(params, bn_state, np.ascontiguousarray(flipped))
            out2 = np.asarray(outs2[-1], np.float32)
            out = flip_test_merge(out, out2, flip_pairs)

        res = [out.shape[2], out.shape[1]]
        preds = final_preds(out, batch["center"], batch["scale"], res, batch["rot"])
        if task == "mpii":
            c = out.shape[3]
            o_idxs = MPII_ORIGIN_IDX if c == 16 else list(range(c))
            acc_o = accuracy_origin_res(
                out, batch["center"], batch["scale"], res,
                batch["pts"], batch["normalizer"], batch["rot"], idxs=o_idxs,
            )
            metrics_meter.update(float(acc_o[0]))
        else:
            nme = float(np.sum(per_image_nme(preds, batch["pts"])) / out.shape[0])
            metrics_meter.update(nme)

        if predictions is None:
            n_total = num_val if num_val is not None else len(loader) * out.shape[0]
            predictions = np.zeros((n_total, out.shape[3], 2), np.float32)
        for n in range(out.shape[0]):
            predictions[int(batch["index"][n])] = preds[n]

    if log:
        log.print_log(
            f"validation: loss {losses.avg:.6f} metric {metrics_meter.avg:.4f}"
        )
    return losses.avg, metrics_meter.avg, predictions
