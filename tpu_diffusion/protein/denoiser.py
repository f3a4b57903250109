"""SE(3)-equivariant GVP-GNN denoiser on padded dense protein batches.

Rebuilds `amortised diffusion/src/models/gvp_gnn.py` (`GVPDenoiserV2`
:233-382, edge features :27-55) and `positional_embeddings.py`: RBF edge
scalars (D_max=6, 16 bins) + unit direction edge vectors, sinusoidal
node-order embeddings, time appended to node scalars (or sin-encoded),
5 GVPConv layers at (256, 64) hidden dims, single output vector channel
mean-centered per graph -> equivariant eps_hat.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_diffusion.protein.geometry import masked_mean
from tpu_diffusion.protein.gvp import (GVP, DenseGVPConvLayer, GVPLayerNorm,
                                       norm_no_nan)
from tpu_diffusion.protein.sde import ProteinBatch

Array = jax.Array


def sinusoidal_encoding(x: Array, embed_dim: int,
                        max_steps: int = 10_000) -> Array:
    """Standard transformer sin/cos encoding of integer (or float) ids
    (reference positional_embeddings.py:9-104)."""
    half = embed_dim // 2
    freqs = jnp.exp(-math.log(max_steps)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = x.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def rbf(d: Array, d_min: float = 0.0, d_max: float = 6.0,
        num_rbf: int = 16) -> Array:
    """Gaussian radial basis expansion of distances
    (reference gvp_gnn.py:27-44)."""
    mu = jnp.linspace(d_min, d_max, num_rbf)
    sigma = (d_max - d_min) / num_rbf
    return jnp.exp(-((d[..., None] - mu) / sigma) ** 2)


def edge_features(pos: Array, mask: Array, d_max: float = 6.0,
                  num_rbf: int = 16) -> Tuple[Array, Array, Array]:
    """Dense pairwise edge features.

    Returns (edge_s [B,N,N,num_rbf], edge_v [B,N,N,1,3], pair_mask [B,N,N])
    with self loops removed (the reference's fully-connected edge_index has
    no diagonal, sde_diffusion.py:268-271).
    """
    b, n, _ = pos.shape
    diff = pos[:, None, :, :] - pos[:, :, None, :]   # j - i per (i, j)
    dist = norm_no_nan(diff, axis=-1)
    edge_s = rbf(dist, d_max=d_max, num_rbf=num_rbf)
    unit = diff / dist[..., None]
    eye = jnp.eye(n, dtype=bool)
    pair_mask = (mask[:, :, None] & mask[:, None, :]) & ~eye
    return edge_s, unit[..., None, :], pair_mask


class GVPDenoiser(nn.Module):
    """eps_hat = GVPDenoiser(batch, t). Call via `apply(params, batch, t)`.

    t: [B] normalized times (the reference passes t in [0,1] and concats it
    to the node scalars when sin_temp_enc=False, gvp_gnn.py:202-206).
    """

    max_protein_length: int = 112
    n_lookup_feats: int = 16
    n_h_node_feats: Tuple[int, int] = (256, 64)
    n_h_edge_feats: Tuple[int, int] = (256, 64)
    n_conv_layers: int = 5
    n_msg_layers: int = 3
    n_ff_layers: int = 1
    drop_rate: float = 0.0
    sin_temp_enc: bool = False
    num_steps: int = 250          # for sin time encoding scale
    d_max: float = 6.0
    num_rbf: int = 16
    # Rematerialize each conv layer in the backward pass: the dense
    # [B, N, N, ...] message tensors dominate training memory (294 MB per
    # layer at the reference config's bs 32 / N 112), and without remat
    # the reference batch size OOMs a 16 GB v5e. Costs one extra forward
    # per layer; parameters are unchanged (tests/test_protein.py).
    remat: bool = False

    @nn.compact
    def __call__(self, batch: ProteinBatch, t: Array, *,
                 train: bool = False) -> Array:
        pos, mask = batch.pos, batch.mask
        b, n, _ = pos.shape

        edge_s, edge_v, pair_mask = edge_features(pos, mask, self.d_max,
                                                  self.num_rbf)

        # node scalars: sinusoidal chain-position embedding (+ time)
        x_s = sinusoidal_encoding(batch.node_order, self.n_lookup_feats,
                                  self.max_protein_length)
        if self.sin_temp_enc:
            x_s = x_s + sinusoidal_encoding(t * self.num_steps,
                                            self.n_lookup_feats,
                                            self.num_steps)[:, None, :]
        else:
            x_s = jnp.concatenate(
                [x_s, jnp.broadcast_to(t[:, None, None], (b, n, 1))], -1)
        # node vectors: the position itself as one vector channel
        x_v = pos[..., None, :]

        h_v = GVP(self.n_h_node_feats, scalar_act=None, vector_act=None,
                  vector_gate=True, name="W_v")((x_s, x_v))
        h_e = GVP(self.n_h_edge_feats, scalar_act=None, vector_act=None,
                  vector_gate=True, name="W_e")((edge_s, edge_v))
        h_e = GVPLayerNorm(name="W_e_norm")(h_e)

        # static_argnums counts self as 0 -> 4 is `deterministic`
        layer_cls = (nn.remat(DenseGVPConvLayer, static_argnums=(4,))
                     if self.remat else DenseGVPConvLayer)
        for i in range(self.n_conv_layers):
            h_v = layer_cls(
                node_dims=self.n_h_node_feats,
                edge_dims=self.n_h_edge_feats,
                n_message=self.n_msg_layers,
                n_feedforward=self.n_ff_layers,
                drop_rate=self.drop_rate,
                vector_gate=True,
                scalar_act=nn.relu, vector_act=None,
                name=f"conv_{i}")(h_v, h_e, pair_mask, not train)

        h_v = GVPLayerNorm(name="out_norm")(h_v)
        _, out_v = GVP((self.n_h_node_feats[0], 1), scalar_act=nn.relu,
                       vector_act=None, vector_gate=True,
                       name="W_out")(h_v)
        eps = out_v[..., 0, :]                       # [B, N, 3]
        eps = eps * mask[..., None]
        # mean-center per graph -> stays in the COM-free subspace (:376-378)
        eps = (eps - masked_mean(eps, mask, axis=-2)) * mask[..., None]
        return eps


class MLPDenoiser(nn.Module):
    """Toy per-node MLP denoiser (reference src/models/denoiser.py:21-62):
    positions + time -> eps, mean-centered. Not equivariant — the sanity
    baseline the GVP model is compared against."""

    hidden: int = 128
    depth: int = 3

    @nn.compact
    def __call__(self, batch: ProteinBatch, t: Array, *,
                 train: bool = False) -> Array:
        del train
        b, n, _ = batch.pos.shape
        h = jnp.concatenate(
            [batch.pos,
             sinusoidal_encoding(batch.node_order, 8, n or 1),
             jnp.broadcast_to(t[:, None, None], (b, n, 1))], axis=-1)
        for _ in range(self.depth):
            h = nn.relu(nn.Dense(self.hidden)(h))
        eps = nn.Dense(3)(h) * batch.mask[..., None]
        return (eps - masked_mean(eps, batch.mask, axis=-2)) \
            * batch.mask[..., None]
