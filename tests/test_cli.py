"""End-to-end CLI test: tiny synthetic training run through the real entry
point, checking logs, checkpoints, and resume."""

import json
import os

import numpy as np
import pytest

from cunet_tpu.cli.train import main


def _args(tmp_path, epochs=1, extra=()):
    return [
        "--exp_id", "t", "--exp_dir", str(tmp_path),
        "--dataset", "synthetic", "--layer_num", "2", "--order", "1",
        "--class_num", "4", "--loss_num", "2", "--bs", "4",
        "--nEpochs", str(epochs), "--synthetic_len", "8",
        "--adjust_lr", "true", "--compute_dtype", "float32",
        "--nThreads", "0", "--neck_size", "2", "--growth_rate", "8",
        "--init_chan_num", "16", "--num_blocks", "2",
        "--inp_res", "32", "--out_res", "8", "--print_freq", "1",
    ] + list(extra)


class TestCli:
    def test_full_run_artifacts(self, tmp_path):
        assert main(_args(tmp_path, epochs=1)) == 0
        exp = tmp_path / "t"
        assert (exp / "opt.txt").exists()
        assert (exp / "log.txt").exists()
        summary = (exp / "training-summary.txt").read_text().strip().split("\n")
        assert summary[0].split("\t") == [
            "epoch", "lr", "train_loss", "val_loss", "train_metric", "val_metric"
        ]
        assert len(summary) == 2
        # reference-style lr-encoded checkpoint name
        assert (exp / "lr-0.00025-1").is_dir()
        assert (exp / "lr-0.00025-1-preds.mat").exists()
        hist = json.loads((exp / "lr-0.00025-1-history.json").read_text())
        assert hist["epoch"][-1]["epoch"] == 1

    def test_resume_continues(self, tmp_path):
        main(_args(tmp_path, epochs=1))
        # resume from epoch 1, run through epoch 2
        assert main(_args(tmp_path, epochs=2, extra=["--resume_prefix", "lr-0.00025-1"])) == 0
        exp = tmp_path / "t"
        assert (exp / "lr-0.00025-2").is_dir()
        summary = (exp / "training-summary.txt").read_text().strip().split("\n")
        assert len(summary) == 3  # header + epoch1 + epoch2 (appended on resume)

    def test_eval_only_dense_unet(self, tmp_path):
        """run_eval must build the dense_unet when asked (previously it
        silently evaluated a random cu_net)."""
        main(_args(tmp_path, epochs=1, extra=["--model", "dense_unet",
                                              "--loss_num", "1"]))
        rc = main(_args(tmp_path, epochs=1, extra=[
            "--model", "dense_unet", "--loss_num", "1",
            "--is_train", "false", "--resume_prefix", "lr-0.00025-1"]))
        assert rc == 0
        log = (tmp_path / "t" / "log.txt").read_text()
        assert "=> not load weights" not in log  # all leaves restored

    def test_pallas_flag_notes(self, tmp_path):
        """No silent flag drops: on a CPU backend --use_pallas must be
        announced as disabled (and the quant-eval interaction noted on TPU)."""
        rc = main(_args(tmp_path, epochs=1, extra=[
            "--quantize", "true", "--use_pallas", "true"]))
        assert rc == 0
        log = (tmp_path / "t" / "log.txt").read_text()
        assert "--use_pallas requires a TPU backend" in log

    def test_missing_exp_id(self, tmp_path, capsys):
        assert main(["--exp_dir", str(tmp_path)]) == 1

    def test_eval_only_mode(self, tmp_path):
        # train 1 epoch, then validate-only from the checkpoint
        main(_args(tmp_path, epochs=1))
        rc = main(_args(tmp_path, epochs=1, extra=[
            "--is_train", "false", "--resume_prefix", "lr-0.00025-1"]))
        assert rc == 0
        exp = tmp_path / "t"
        assert (exp / "eval-preds.mat").exists()
        log = (exp / "log.txt").read_text()
        assert "PCKh@0.5" in log
