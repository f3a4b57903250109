"""Protein diffusion training objective (rebuilds `src/models/resdiff.py`).

Loss per batch (resdiff.py:36-157): t ~ U(1e-3, 1-1e-3) per graph, COM-free
noising, eps_hat = model(noised, t), DSM MSE(eps, eps_hat), plus auxiliary
losses gated at t <= aux_cutoff with weight 0.25:
  * backbone MSE between the totally-denoised positions and the truth,
  * distogram MSE between sequential-neighbor distances (the reference's
    "sequential" mode, distances.py:6-22; the radius-graph mode is the
    masked dense variant).
Optional motif-conditional training applies a Kabsch-aligned motif loss
(resdiff.py:103-109) — exposed via `motif_fn`.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_diffusion.protein.sde import HoogeboomGraphSDE, ProteinBatch

Array = jax.Array


def sequential_distances(pos: Array, mask: Array) -> Tuple[Array, Array]:
    """Distances between chain neighbors (i, i+1). Returns (d [B, N-1],
    valid [B, N-1])."""
    d = jnp.sqrt(jnp.sum((pos[:, 1:] - pos[:, :-1]) ** 2, -1) + 1e-12)
    valid = mask[:, 1:] & mask[:, :-1]
    return d, valid


def pairwise_distances(pos: Array, mask: Array) -> Tuple[Array, Array]:
    d = jnp.sqrt(jnp.sum(
        (pos[:, :, None, :] - pos[:, None, :, :]) ** 2, -1) + 1e-12)
    n = pos.shape[1]
    valid = (mask[:, :, None] & mask[:, None, :]) & ~jnp.eye(n, dtype=bool)
    return d, valid


def _masked_mse(a: Array, b: Array, valid: Array) -> Array:
    w = valid.astype(a.dtype)
    return jnp.sum(w * (a - b) ** 2) / jnp.maximum(jnp.sum(w), 1.0)


def resdiff_loss(key: Array,
                 model_apply: Callable[[ProteinBatch, Array], Array],
                 diffuser: HoogeboomGraphSDE, batch: ProteinBatch,
                 aux_weight: float = 0.25, aux_cutoff: float = 0.25,
                 distogram: str = "sequential",
                 motif_fn: Optional[Callable] = None
                 ) -> Tuple[Array, Dict[str, Array]]:
    """Returns (total_loss, metrics)."""
    kt, kn = jax.random.split(key)
    b = batch.num_graphs
    t = jax.random.uniform(kt, (b,), minval=1e-3, maxval=1.0 - 1e-3)

    noised, eps = diffuser.noising(kn, batch, t)
    eps_hat = model_apply(noised, t)

    node_w = batch.mask[..., None].astype(eps.dtype)
    n_coords = jnp.maximum(jnp.sum(node_w), 1.0) * 3
    dsm = jnp.sum(node_w * (eps - eps_hat) ** 2) / n_coords

    # total denoise with the predicted noise -> x0_hat
    denoised = diffuser.denoising(noised, eps_hat, t)
    gate = (t <= aux_cutoff).astype(eps.dtype)[:, None, None]

    bb_sq = node_w * (denoised.pos - batch.pos) ** 2 * gate
    bb = jnp.sum(bb_sq) / jnp.maximum(
        jnp.sum(node_w * gate) * 3, 1.0)

    if distogram == "sequential":
        d_hat, valid = sequential_distances(denoised.pos, batch.mask)
        d_true, _ = sequential_distances(batch.pos, batch.mask)
    else:
        d_hat, valid = pairwise_distances(denoised.pos, batch.mask)
        d_true, _ = pairwise_distances(batch.pos, batch.mask)
    # gate is [B,1,1]: drop trailing axes down to the rank of `valid`
    # ([B,N-1] sequential, [B,N,N] pairwise) — gate[..., 0] ([B,1]) would
    # fail to broadcast against [B,N,N] (or silently gate the wrong axis
    # when B == N)
    gate2 = gate if valid.ndim == 3 else gate[..., 0]
    w = valid.astype(eps.dtype) * gate2
    disto = jnp.sum(w * (d_hat - d_true) ** 2) / jnp.maximum(jnp.sum(w), 1.0)

    total = dsm + aux_weight * (bb + disto)
    metrics = {"dsm": dsm, "backbone_mse": bb, "distogram_mse": disto}

    if motif_fn is not None:
        motif = motif_fn(denoised, batch)
        total = total + aux_weight * motif
        metrics["motif"] = motif

    metrics["loss"] = total
    return total, metrics
