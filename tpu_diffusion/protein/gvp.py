"""Geometric Vector Perceptron layers on padded dense graphs.

Rebuilds `amortised diffusion/src/models/gvp.py` and `gvp_conv_layer.py`
(the GVP-GNN of Jing et al. 2021) in Flax. The reference runs sparse
PyG message passing over fully-connected edge lists; a fully-connected
graph on a padded [B, N] batch is exactly a dense [B, N, N] pairwise
computation, which XLA tiles onto the MXU far better than gather/scatter —
so messages here are dense with an edge mask (diagonal removed == no self
loops, padding removed).

Feature convention: scalars s [..., ds], vectors v [..., dv, 3].
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
SV = Tuple[Array, Array]


def norm_no_nan(x: Array, axis: int = -1, keepdims: bool = False,
                eps: float = 1e-8, sqrt: bool = True) -> Array:
    """Clamped L2 norm (reference gvp.py:7-14)."""
    out = jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims),
                      eps)
    return jnp.sqrt(out) if sqrt else out


class GVP(nn.Module):
    """Geometric vector perceptron with optional vector gating
    (reference gvp.py:17-80)."""

    out_dims: Tuple[int, int]                 # (so, vo)
    h_dim: Optional[int] = None
    scalar_act: Optional[Callable] = nn.relu
    vector_act: Optional[Callable] = jax.nn.sigmoid
    vector_gate: bool = False

    @nn.compact
    def __call__(self, x: SV | Array) -> SV | Array:
        so, vo = self.out_dims
        if isinstance(x, tuple):
            s, v = x
        else:
            s, v = x, None

        if v is not None and v.shape[-2] > 0:
            vi = v.shape[-2]
            h_dim = self.h_dim or max(vi, vo)
            # vectors mix across channels only (equivariance): [.., 3, vi]
            vt = jnp.swapaxes(v, -1, -2)
            vh = nn.Dense(h_dim, use_bias=False, name="wh")(vt)
            vn = norm_no_nan(vh, axis=-2)
            s = nn.Dense(so, name="ws")(jnp.concatenate([s, vn], -1))
            if vo:
                vout = nn.Dense(vo, use_bias=False, name="wv")(vh)
                vout = jnp.swapaxes(vout, -1, -2)   # [..., vo, 3]
                if self.vector_gate:
                    gate_in = self.vector_act(s) if self.vector_act else s
                    gate = nn.Dense(vo, name="wsv")(gate_in)
                    vout = vout * jax.nn.sigmoid(gate)[..., None]
                elif self.vector_act is not None:
                    vout = vout * self.vector_act(
                        norm_no_nan(vout, axis=-1, keepdims=True))
        else:
            s = nn.Dense(so, name="ws")(s)
            if vo:
                vout = jnp.zeros(s.shape[:-1] + (vo, 3), s.dtype)
        if self.scalar_act is not None:
            s = self.scalar_act(s)
        return (s, vout) if vo else s


class GVPLayerNorm(nn.Module):
    """LayerNorm on scalars; vectors scaled by their RMS norm
    (reference gvp.py LayerNorm)."""

    @nn.compact
    def __call__(self, x: SV) -> SV:
        s, v = x
        s = nn.LayerNorm()(s)
        vn = norm_no_nan(v, axis=-1, keepdims=True, sqrt=False)
        vn = jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True) + 1e-8)
        return s, v / vn


class GVPDropout(nn.Module):
    """Scalar dropout + whole-vector-channel dropout (reference _VDropout)."""

    rate: float

    @nn.compact
    def __call__(self, x: SV, deterministic: bool = True) -> SV:
        s, v = x
        if self.rate == 0.0 or deterministic:
            return x
        s = nn.Dropout(self.rate)(s, deterministic=False)
        keep = nn.Dropout(self.rate, broadcast_dims=(v.ndim - 1,))(
            jnp.ones_like(v[..., :1]), deterministic=False)
        return s, v * keep


def _gvp_stack(dims_in_unused, out_dims, n_layers, activations, vector_gate,
               final_linear=True) -> Sequence[nn.Module]:
    """n_layers GVPs ending in a linear (no-activation) GVP, matching the
    reference's message/feedforward constructors."""
    sact, vact = activations
    mods = []
    for i in range(n_layers):
        last = i == n_layers - 1
        mods.append(GVP(out_dims,
                        scalar_act=None if (last and final_linear) else sact,
                        vector_act=None if (last and final_linear) else vact,
                        vector_gate=vector_gate))
    return mods


class DenseGVPConvLayer(nn.Module):
    """GVPConv (mean aggregation) + residual + feedforward, on dense pairs
    (reference gvp_conv_layer.py:88-147 + GVPConv :9-87).

    Message input per directed edge (i<-j): concat of (s_j, v_j), edge
    features, (s_i, v_i) — the reference's tuple_cat order.
    """

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    n_message: int = 3
    n_feedforward: int = 1
    drop_rate: float = 0.0
    vector_gate: bool = True
    scalar_act: Optional[Callable] = nn.relu
    vector_act: Optional[Callable] = None   # reference V2 uses (relu, None)

    @nn.compact
    def __call__(self, x: SV, edge_attr: SV, pair_mask: Array,
                 deterministic: bool = True) -> SV:
        """x: (s [B,N,ds], v [B,N,dv,3]); edge_attr: (se [B,N,N,de],
        ve [B,N,N,dve,3]); pair_mask [B,N,N] (True = real edge i<-j)."""
        s, v = x
        b, n, ds = s.shape
        acts = (self.scalar_act, self.vector_act)

        # --- messages over dense pairs ---
        s_i = jnp.broadcast_to(s[:, :, None, :], (b, n, n, ds))
        s_j = jnp.broadcast_to(s[:, None, :, :], (b, n, n, ds))
        dv = v.shape[-2]
        v_i = jnp.broadcast_to(v[:, :, None], (b, n, n, dv, 3))
        v_j = jnp.broadcast_to(v[:, None, :], (b, n, n, dv, 3))
        ms = jnp.concatenate([s_j, edge_attr[0], s_i], axis=-1)
        mv = jnp.concatenate([v_j, edge_attr[1], v_i], axis=-2)

        h: SV = (ms, mv)
        for i, mod in enumerate(_gvp_stack(None, self.node_dims,
                                           self.n_message, acts,
                                           self.vector_gate)):
            h = mod(h)
        msg_s, msg_v = h
        w = pair_mask[..., None].astype(msg_s.dtype)
        denom = jnp.maximum(jnp.sum(w, axis=2), 1.0)       # [B, N, 1]
        agg_s = jnp.sum(msg_s * w, axis=2) / denom
        agg_v = jnp.sum(msg_v * w[..., None], axis=2) / denom[..., None]

        d_s, d_v = GVPDropout(self.drop_rate)((agg_s, agg_v), deterministic)
        s, v = GVPLayerNorm()((s + d_s, v + d_v))

        # --- pointwise feedforward ---
        if self.n_feedforward == 1:
            ff_mods = [GVP(self.node_dims, scalar_act=None, vector_act=None,
                           vector_gate=self.vector_gate)]
        else:
            hid = (4 * self.node_dims[0], 2 * self.node_dims[1])
            ff_mods = [GVP(hid, scalar_act=acts[0], vector_act=acts[1],
                           vector_gate=self.vector_gate)]
            for _ in range(self.n_feedforward - 2):
                ff_mods.append(GVP(hid, scalar_act=acts[0],
                                   vector_act=acts[1],
                                   vector_gate=self.vector_gate))
            ff_mods.append(GVP(self.node_dims, scalar_act=None,
                               vector_act=None,
                               vector_gate=self.vector_gate))
        h = (s, v)
        for mod in ff_mods:
            h = mod(h)
        dh = GVPDropout(self.drop_rate)(h, deterministic)
        return GVPLayerNorm()((s + dh[0], v + dh[1]))
