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


def tree_shardings(mesh: Mesh, tree: PyTree,
                   min_shard_elems: int = 1024) -> PyTree:
    """Apply the `leaf_spec` layout rule to every leaf of any pytree."""
    model_size = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())
    if model_size == 1:
        return jax.tree.map(lambda _: rep, tree)

    def one(x):
        if hasattr(x, "shape"):
            return NamedSharding(mesh, leaf_spec(x.shape, model_size,
                                                 min_shard_elems))
        return rep

    return jax.tree.map(one, tree)


def state_shardings(mesh: Mesh, state, min_shard_elems: int = 1024):
    """Shardings for a TrainState: params / ema / adam moments follow the
    same layout; scalars replicate.

    The layout is a pure function of leaf shape (`leaf_spec`), so applying
    it leaf-wise to opt_state/ema reproduces the parameter layout on the
    adam moments exactly — one rule everywhere, no shape-matching table
    that could silently mis-shard under future per-param overrides.
    """
    rep = NamedSharding(mesh, P())
    return type(state)(
        step=rep,
        params=tree_shardings(mesh, state.params, min_shard_elems),
        opt_state=tree_shardings(mesh, state.opt_state, min_shard_elems),
        ema=tree_shardings(mesh, state.ema, min_shard_elems),
        rng=rep,
    )
