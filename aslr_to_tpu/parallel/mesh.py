"""Device mesh and multi-host utilities.

The reference has no distributed backend at all (SURVEY §2.3: no
MPI/NCCL/Gloo, ``nthreads = 1``). This module is the new first-class
scale-out subsystem: a scenario-batch ("dp") mesh over ICI within a slice
and DCN across hosts, with JAX runtime collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

BATCH_AXIS = "batch"


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize the multi-host JAX runtime (N>=2 hosts over DCN).

    No-op for single-process runs; mirrors ``jax.distributed.initialize``
    defaults (cluster auto-detection) otherwise.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_batch_mesh(n_devices: Optional[int] = None, axis: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over the scenario-batch axis.

    Uses all addressable devices by default. The batch dimension is the
    embarrassingly-parallel axis of this domain (SURVEY §2.3): sharding it
    maps scenarios onto chips with zero per-step collectives; only metric
    reductions cross the ICI/DCN.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = BATCH_AXIS) -> NamedSharding:
    """Sharding that splits the leading (scenario) dimension over the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
