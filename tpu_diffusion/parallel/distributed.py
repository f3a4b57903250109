"""Multi-host initialization and cross-host data utilities.

The reference's multi-node story is SLURM requeue scripts (SURVEY.md §2.4);
the TPU-native equivalent is `jax.distributed.initialize` + one global mesh
over all hosts' devices (ICI within a slice, DCN across slices — XLA routes
collectives automatically given the mesh).

Typical pod usage:
    initialize_distributed()          # no-op on single host
    mesh = make_mesh()                # over jax.devices() == global devices
    batch = host_local_to_global(mesh, local_batch)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    if distributed mode is active. Reads the standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) when args are None;
    silently no-ops for single-process runs."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def host_local_to_global(mesh: Mesh, local_batch: PyTree,
                         axis: str = "data") -> PyTree:
    """Assemble per-host batch shards into one global array
    (`jax.make_array_from_process_local_data`)."""
    sharding = NamedSharding(mesh, P(axis))

    def assemble(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(assemble, local_batch)


def process_batch_slice(global_batch: int) -> slice:
    """This process's slice of a host-partitioned global batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global_batch={global_batch} not divisible by "
            f"process_count={n} — the remainder would be silently "
            f"dropped from every step")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
