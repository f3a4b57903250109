"""Pallas fused attention kernel for the UNet's spatial self-attention.

The reference materializes the full [B*H, T, T] attention matrix in HBM via
einsum (image_diffusion/unet.py:443-448, 471-483). For the 64x64 and 256x256
SR configs (T up to 4096 at the first attention resolution) that matrix is
the HBM-bandwidth hot spot. This kernel keeps K/V and one query block
resident in VMEM and never writes the T x T logits to HBM:

  grid = (batch*heads, T // BLOCK_Q); each program computes
  softmax(q_blk K^T / sqrt(d)) V with fp32 logits entirely on-chip.

VMEM budget per program ~ BLOCK_Q*T*4 bytes of logits + 2*T*d*2 bytes of
K/V; with BLOCK_Q=256, T<=4096, d<=128 this stays under ~6 MB (16 MB VMEM).
For longer sequences switch to the two-pass running-softmax variant (not
needed at this framework's resolutions — SURVEY.md §5.7).

A custom VJP reuses the same kernel for the backward contractions, so
training also avoids the T x T HBM round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)           # [bq, d]
    k = k_ref[0].astype(jnp.float32)           # [T, d]
    v = v_ref[0]                                # [T, d]
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [bq, T]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_attention_3d(q: Array, k: Array, v: Array, block_q: int) -> Array:
    """q,k,v: [BH, T, d] -> [BH, T, d]."""
    bh, t, d = q.shape
    scale = d ** -0.5
    block_q = min(block_q, t)
    while t % block_q:
        block_q //= 2
    grid = (bh, t // block_q)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=bh * t * d * 2 * 4,
            transcendentals=bh * t * t,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: Array, k: Array, v: Array,
                    block_q: int = 256) -> Array:
    """Fused softmax(QK^T/sqrt(d))V. q,k,v: [B, H, T, d] (or [BH, T, d])."""
    return _fa_fwd(q, k, v, block_q)[0]


def _merge(x):
    if x.ndim == 4:
        b, h, t, d = x.shape
        return x.reshape(b * h, t, d), (b, h)
    return x, None


def _fa_fwd(q, k, v, block_q):
    q3, shape = _merge(q)
    k3, _ = _merge(k)
    v3, _ = _merge(v)
    o3 = _flash_attention_3d(q3, k3, v3, block_q)
    o = o3 if shape is None else o3.reshape(*shape, *o3.shape[1:])
    return o, (q, k, v)


def _fa_bwd(block_q, res, g):
    """Backward via recomputation with plain XLA contractions (the T x T
    products live only inside this fused backward jit scope; XLA fuses the
    softmax recompute with the contractions)."""
    q, k, v = res
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    logits = jnp.einsum("...td,...sd->...ts", qf * scale, kf)
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("...ts,...td->...sd", p, gf)
    dp = jnp.einsum("...td,...sd->...ts", gf, vf)
    tmp = dp - jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * tmp
    dq = jnp.einsum("...ts,...sd->...td", ds, kf) * scale
    dk = jnp.einsum("...ts,...td->...sd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def reference_attention(q: Array, k: Array, v: Array) -> Array:
    """Plain XLA attention (fp32 softmax) for correctness comparison."""
    d = q.shape[-1]
    logits = jnp.einsum("...td,...sd->...ts",
                        q.astype(jnp.float32) * d**-0.5,
                        k.astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...ts,...sd->...td", p, v)
