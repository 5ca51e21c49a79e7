"""Device mesh + sharding layout for CU-Net training and inference.

The reference's entire distribution story is single-process
``torch.nn.DataParallel`` replicate/scatter/gather (ref:cu-net.py:59) with
pinned-memory loaders. The TPU-native replacement (SURVEY.md §2.6):

- a 2-D ``jax.sharding.Mesh`` with axes ``('data', 'space')``;
- batch data-parallelism: activations sharded on N over ``data`` — XLA
  inserts the gradient all-reduce over ICI automatically when the loss mean
  crosses the sharded axis (the analog of DataParallel's gather, minus the
  replicate/scatter per step);
- optional spatial partitioning: activations sharded on H over ``space`` —
  XLA's SPMD partitioner performs halo exchange for the 3x3/7x7 convs and
  pooling windows. This is the memory/latency scaling axis a conv model has
  instead of sequence parallelism;
- multi-host: ``jax.distributed.initialize`` before mesh construction puts
  DCN on the outermost (data) axis.

Batch-norm note: statistics reduce over (N, H, W), both sharded axes, so
under SPMD the batch statistics are *global* — matching single-device
semantics exactly rather than DataParallel's silent per-replica stats
(SURVEY.md §7.3 hard part #1).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    dp: Optional[int] = None,
    sp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, space)`` mesh.

    ``dp=None`` uses all remaining devices for data parallelism. ``sp`` folds
    the last mesh dimension over ICI neighbors so halo exchanges stay local.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % sp != 0:
            raise ValueError(f"{n} devices not divisible by sp={sp}")
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_spec() -> P:
    """NHWC activations: N over data, H over space."""
    return P(DATA_AXIS, SPACE_AXIS, None, None)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh with NHWC batch sharding for
    4-D arrays and replication for the rest."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim == 4:
            return jax.device_put(x, batch_sharding(mesh))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)
