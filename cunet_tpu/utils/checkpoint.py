"""Orbax-backed checkpoint/resume with the reference's epoch protocol.

Behavioral rebuild of ref:utils/checkpoint.py: per-epoch save of
{train_history, model+optimizer state}, an lr-encoded directory name
(``lr-<lr>-<epoch>``), a predictions ``.mat`` sidecar
(``scipy.io.savemat``, ref :22-24), best-copy when ``history.is_best``
(ref :25-31), and a tolerant name-matched load that skips missing keys
(ref :52-62). The torch single-file ``.pth.tar`` becomes an Orbax directory;
preemption safety comes from Orbax's atomic finalization.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from cunet_tpu.utils.history import TrainHistory


def _lr_prefix(lr: float) -> str:
    """``lr-%.15f`` right-stripped of zeros/dot (ref:utils/checkpoint.py:14)."""
    return ("lr-%.15f" % lr).rstrip("0").rstrip(".")


class Checkpoint:
    """Save/load under ``exp_dir`` with reference-style names."""

    def __init__(self, exp_dir: str, save_prefix: str = ""):
        self.exp_dir = os.path.abspath(exp_dir)
        os.makedirs(self.exp_dir, exist_ok=True)
        self.save_prefix = save_prefix
        self._ckptr = ocp.PyTreeCheckpointer()

    # -- naming ----------------------------------------------------------
    def ckpt_name(self, lr: float, epoch: int) -> str:
        return f"{self.save_prefix}{_lr_prefix(lr)}-{epoch}"

    def _path(self, name: str) -> str:
        return os.path.join(self.exp_dir, name)

    # -- save ------------------------------------------------------------
    def save(
        self,
        state: Any,
        history: TrainHistory,
        preds: Optional[np.ndarray] = None,
    ) -> str:
        """Save train state + history (+ predictions .mat); copy to
        ``*-model-best`` when the epoch is the best so far."""
        from cunet_tpu.models.cu_net import canonicalize_slots

        lr, epoch = history.last_lr, history.last_epoch
        name = self.ckpt_name(lr, epoch)
        path = self._path(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        # on-disk layout is ALWAYS the canonical per-slot-list form:
        # stacked-slot runtime trees (models.stack_steady) are converted, so
        # checkpoints interoperate across stacked and canonical runs
        self._ckptr.save(path, canonicalize_slots(jax.device_get(state)))
        with open(path + "-history.json", "w") as f:
            json.dump(history.state_dict(), f)
        if preds is not None:
            import scipy.io

            scipy.io.savemat(path + "-preds.mat", mdict={"preds": np.asarray(preds)})
        if history.is_best:
            best = self._path(name + "-model-best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            shutil.copyfile(path + "-history.json", best + "-history.json")
            if preds is not None:
                shutil.copyfile(path + "-preds.mat", best + "-preds.mat")
        return path

    # -- load ------------------------------------------------------------
    def load(
        self, template_state: Any, name: str, history: Optional[TrainHistory] = None
    ) -> Tuple[Any, Optional[TrainHistory]]:
        """Restore into the template's structure. Arrays whose tree path is
        missing from the checkpoint keep their template values (the
        reference's skip-on-missing name matching, ref:utils/checkpoint.py:52-62)."""
        from cunet_tpu.models.cu_net import canonicalize_slots, stack_like

        path = self._path(name)
        restored = self._ckptr.restore(path)
        # checkpoints are canonical on disk; merge in canonical space, then
        # re-stack to the template's (possibly stacked-slot) layout
        canon_template = canonicalize_slots(template_state)
        state = _merge_by_path(canon_template, restored)
        state = stack_like(template_state, state)
        if history is not None and os.path.exists(path + "-history.json"):
            with open(path + "-history.json") as f:
                history.load_state_dict(json.load(f))
        return state, history

    def latest_name(self) -> Optional[str]:
        """Most recent checkpoint dir by epoch suffix."""
        names = [
            n
            for n in os.listdir(self.exp_dir)
            if os.path.isdir(self._path(n)) and n.startswith(f"{self.save_prefix}lr-")
            and not n.endswith("-model-best")
        ]
        if not names:
            return None
        return max(names, key=lambda n: int(n.rsplit("-", 1)[-1]))


def _norm_path(path) -> str:
    """Structure-agnostic path key: attribute, dict-key, and sequence-index
    entries all normalize to their bare names, so a dataclass template
    matches the dict-of-dicts Orbax writes to disk."""
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _merge_by_path(template, restored):
    """Copy restored leaves onto the template where paths line up; keep the
    template leaf (and warn) otherwise — the reference's skip-on-missing
    name matching."""
    r_map = {
        _norm_path(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(restored)[0]
    }

    def fill(path, leaf):
        key = _norm_path(path)
        if key in r_map and r_map[key] is not None:
            arr = np.asarray(r_map[key])
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
                print(f"=> not load weights '{key}' (shape {arr.shape} != {leaf.shape})")
                return leaf
            return jax.numpy.asarray(arr, dtype=getattr(leaf, "dtype", None))
        print(f"=> not load weights '{key}'")
        return leaf

    return jax.tree_util.tree_map_with_path(fill, template)


def strip_resume_prefix(resume_prefix: str) -> str:
    """Reference CLI surgery: strip from 'pth' onward, append '-'
    (ref:options/base_options.py:62-65). Kept for CLI-surface parity; Orbax
    names have no extension so this is only applied to legacy-style names."""
    if "pth" in resume_prefix:
        i = resume_prefix.index("pth")
        resume_prefix = resume_prefix[: i - 1] + "-"
    return resume_prefix
