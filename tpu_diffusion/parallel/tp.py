"""Tensor-parallel parameter sharding over the mesh "model" axis.

The reference has no model parallelism (SURVEY.md §2.4); this is the
TPU-native extension for the large SR configs: shard each weight's widest
divisible axis over "model" (output-channel sharding for convs/denses,
embedding rows for tables) and let XLA's sharding propagation insert the
all-gathers/reduce-scatters. Params that don't divide stay replicated.

Usage:
    mesh = make_mesh(model=4)
    shardings = params_shardings(mesh, params)
    state = jax.device_put(state, state_shardings)  # or via Trainer
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_diffusion.parallel.mesh import MODEL_AXIS

PyTree = Any


def leaf_spec(shape, model_size: int, min_shard_elems: int = 1024
              ) -> P:
    """PartitionSpec for one parameter: shard the last divisible axis of a
    >=2D weight over "model"; small or indivisible params replicate."""
    if len(shape) < 2 or int(np.prod(shape)) < min_shard_elems:
        return P()
    for axis in range(len(shape) - 1, -1, -1):
        if shape[axis] % model_size == 0 and shape[axis] >= model_size:
            spec = [None] * len(shape)
            spec[axis] = MODEL_AXIS
            return P(*spec)
    return P()


def params_shardings(mesh: Mesh, params: PyTree,
                     min_shard_elems: int = 1024) -> PyTree:
    """NamedSharding tree matching `params`."""
    model_size = mesh.shape[MODEL_AXIS]
    if model_size == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    return jax.tree.map(
        lambda x: NamedSharding(mesh, leaf_spec(x.shape, model_size,
                                                min_shard_elems)),
        params)


def shard_params(mesh: Mesh, params: PyTree,
                 min_shard_elems: int = 1024) -> PyTree:
    return jax.tree.map(jax.device_put, params,
                        params_shardings(mesh, params, min_shard_elems))


def state_shardings(mesh: Mesh, state, min_shard_elems: int = 1024):
    """Shardings for a TrainState: params / ema / adam moments follow the
    same layout; scalars replicate."""
    p_sh = params_shardings(mesh, state.params, min_shard_elems)
    rep = NamedSharding(mesh, P())

    def map_like(tree):
        flat_p, treedef_p = jax.tree.flatten(state.params)
        flat_sh = jax.tree.leaves(p_sh)
        by_shape = {}
        for x, sh in zip(flat_p, flat_sh):
            by_shape.setdefault(x.shape, sh)

        def one(x):
            if hasattr(x, "shape") and x.shape in by_shape \
                    and len(x.shape) >= 2:
                return by_shape[x.shape]
            return rep

        return jax.tree.map(one, tree)

    return type(state)(
        step=rep,
        params=p_sh,
        opt_state=map_like(state.opt_state),
        ema=map_like(state.ema),
        rng=rep,
    )
