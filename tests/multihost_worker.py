"""Subprocess worker for the real two-process multihost smoke test.

Usage: python multihost_worker.py <process_id> <num_processes> <port>

Each process exposes 2 virtual CPU devices, joins the distributed runtime
via ``initialize_multihost``, builds the pod mesh (data axis spans both
processes — the DCN analog), feeds its half of a deterministic global batch
through ``host_local_batch_to_global``, runs ONE sharded train step, and
prints the (replicated) loss for the parent to compare."""

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from cunet_tpu.config import ModelConfig, TrainConfig  # noqa: E402
from cunet_tpu.models import init_cu_net  # noqa: E402
from cunet_tpu.parallel import replicated  # noqa: E402
from cunet_tpu.parallel.multihost import (  # noqa: E402
    host_local_batch_to_global,
    initialize_multihost,
    make_pod_mesh,
)
from cunet_tpu.train import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_sharded_train_step,
)

ok = initialize_multihost(f"localhost:{port}", num_processes=nproc, process_id=proc_id)
assert ok, "initialize_multihost returned False under an explicit coordinator"
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc  # global view spans both processes

mesh = make_pod_mesh(sp=1)
cfg = ModelConfig(layer_num=2, order=1, loss_num=2, class_num=4, neck_size=2,
                  growth_rate=8, init_chan_num=16, num_blocks=2)
tcfg = TrainConfig(lr=1e-3, batch_size=4 * nproc)
params, bn = init_cu_net(jax.random.PRNGKey(0), cfg)
tx = make_optimizer(tcfg)
state = create_train_state(params, bn, tx)
state = jax.device_put(state, replicated(mesh))

# deterministic global batch; this process materializes only its local half
rs = np.random.RandomState(7)
g_img = rs.randn(tcfg.batch_size, 32, 32, 3).astype(np.float32)
g_hm = rs.rand(tcfg.batch_size, 8, 8, cfg.class_num).astype(np.float32)
lo, hi = proc_id * 4, (proc_id + 1) * 4
batch = host_local_batch_to_global(
    mesh, {"image": g_img[lo:hi], "heatmap": g_hm[lo:hi]}
)

step = make_sharded_train_step(mesh, cfg, tx, donate=False)
new_state, metrics = step(state, batch)
print(f"MULTIHOST_LOSS {float(metrics['loss']):.8f}", flush=True)
jax.distributed.shutdown()
