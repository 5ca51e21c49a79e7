"""REAL two-process multihost test: jax.distributed.initialize with two CPU
processes over a local coordinator (Gloo collectives), one sharded train step
on the pod mesh, losses asserted identical across processes AND equal to
single-process execution. This actually executes parallel/multihost.py's
initialization path (SURVEY §2.6 multi-host DCN obligation)."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from cunet_tpu.config import ModelConfig, TrainConfig
from cunet_tpu.models import init_cu_net
from cunet_tpu.train import create_train_state, make_optimizer, train_step

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTwoProcessMultihost:
    def test_two_process_step_matches_single(self):
        port = _free_port()
        # workers set their own platform env (must precede jax import there)
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        # the workers run with cwd=tests/, so the repo root must be importable
        root = os.path.dirname(_HERE)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in (root, env.get("PYTHONPATH")) if p
        )
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(_HERE, "multihost_worker.py"),
                 str(i), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env, cwd=_HERE,
            )
            for i in range(2)
        ]
        losses = []
        for i, p in enumerate(procs):
            out, err = p.communicate(timeout=540)
            assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err[-3000:]}"
            line = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS")]
            assert line, f"proc {i} printed no loss:\n{out}"
            losses.append(float(line[-1].split()[1]))
        assert losses[0] == losses[1], losses

        # single-process oracle: same params, same global batch, plain step
        cfg = ModelConfig(layer_num=2, order=1, loss_num=2, class_num=4,
                          neck_size=2, growth_rate=8, init_chan_num=16,
                          num_blocks=2)
        tcfg = TrainConfig(lr=1e-3, batch_size=8)
        params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(tcfg)
        state = create_train_state(params, bn, tx)
        rs = np.random.RandomState(7)
        batch = {
            "image": rs.randn(8, 32, 32, 3).astype(np.float32),
            "heatmap": rs.rand(8, 8, 8, cfg.class_num).astype(np.float32),
        }
        _, metrics = jax.jit(
            lambda s, b: train_step(s, b, cfg=cfg, tx=tx)
        )(state, batch)
        np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=1e-5)
