"""Multi-host (pod-slice) initialization and cross-host batch plumbing.

The reference is strictly single-process (SURVEY.md §2.6: no
torch.distributed, no rank/world concepts). TPU-native scaling beyond one
host rides ``jax.distributed.initialize`` + the same mesh code: the global
mesh spans all hosts' devices, DCN sits on the outermost (data) axis, and
each host feeds only its addressable shard of the global batch via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from cunet_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS, batch_spec


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when running under a multi-host
    launcher. No-ops (returns False) in single-process settings.

    Env-driven by default: on Cloud TPU pods ``jax.distributed.initialize()``
    autodetects; explicit args cover bring-your-own launchers.
    """
    # Must not touch the XLA backend before jax.distributed.initialize (even
    # jax.process_count() latches it); probe the distributed client directly.
    from jax._src import distributed as _distributed

    if getattr(_distributed.global_state, "client", None) is not None:
        return jax.process_count() > 1
    explicit = coordinator_address is not None
    env = os.environ.get("COORDINATOR_ADDRESS")
    if not explicit and not env and not os.environ.get("TPU_WORKER_HOSTNAMES_POD"):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address or env,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_pod_mesh(sp: int = 1) -> Mesh:
    """Global mesh over every device of every process. The data axis spans
    hosts (DCN between hosts, ICI within), the space axis stays intra-host so
    conv halo exchanges never cross DCN."""
    devices = np.asarray(jax.devices())
    n = devices.size
    if n % sp:
        raise ValueError(f"{n} global devices not divisible by sp={sp}")
    return Mesh(devices.reshape(n // sp, sp), (DATA_AXIS, SPACE_AXIS))


def host_local_batch_to_global(mesh: Mesh, batch: dict) -> dict:
    """Assemble a global sharded batch from per-host local numpy shards.

    Each process passes its local slice (global_batch / process_count
    samples); returns jax.Arrays sharded over the mesh without gathering.
    """
    sharding = NamedSharding(mesh, batch_spec())

    def put(x):
        x = np.asarray(x)
        if x.ndim == 4:
            return jax.make_array_from_process_local_data(sharding, x)
        return x  # non-image arrays stay host-local (metrics path)

    return {k: put(v) for k, v in batch.items()}
