"""Device mesh + sharding helpers: the framework's parallelism layer.

The reference's only parallelism is single-host `torch.nn.DataParallel`
(cifar10/train_cifar10.py:108-113) with a documented quality regression from
per-device norm statistics (cifar10/README.md:31-35). Here parallelism is a
`jax.sharding.Mesh` with axes ("data", "model"):

  * batch axis sharded over "data" (train steps and sampling fan-out),
  * parameters replicated by default, or sharded over "model" for the
    large SR configs (tensor parallelism hooks in the UNet channel dims),
  * norm statistics are global by construction under XLA collectives —
    the DataParallel caveat disappears.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
global device set forms one mesh (DCN between slices handled by XLA).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh over all (or given) devices.

    Defaults to pure data parallelism: data = n_devices / model.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: PyTree) -> PyTree:
    """Device-put a host batch with the leading axis sharded over "data"."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: PyTree) -> PyTree:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
