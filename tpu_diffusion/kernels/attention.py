"""Pallas fused attention kernels for the UNet's spatial self-attention.

The reference materializes the full [B*H, T, T] attention matrix in HBM via
einsum (image_diffusion/unet.py:443-448, 471-483). For the 64x64 and 256x256
SR configs (T up to 4096 at the first attention resolution) that matrix is
the HBM-bandwidth hot spot. These kernels keep K/V and one query (or key)
block resident in VMEM and never write the T x T logits to HBM.

Forward: grid = (batch*heads, T // BLOCK_Q); each program computes
softmax(q_blk K^T / sqrt(d)) V with fp32 logits entirely on-chip, and also
emits the per-row logsumexp (the flash-attention softmax statistic).

Backward: a custom VJP with two Pallas kernels that recompute P from the
saved logsumexp instead of storing it —

  * dq kernel, grid over q blocks:  ds = P*(dP - delta);  dq = ds K
  * dk/dv kernel, grid over k blocks: dv = P^T g;  dk = ds^T Q

where delta_i = sum_d g_id o_id (computed once in XLA, O(T d)). The T x T
products again live only in VMEM.

VMEM budget per program ~ BLOCK*T*4 bytes of logits + 2*T*d bytes of K/V
(or Q/G); with BLOCK=256, T<=4096, d<=128 this stays under ~6 MB (16 MB
VMEM). For longer sequences switch to a two-pass running-softmax variant
(not needed at this framework's resolutions — SURVEY.md §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _pick_block(t: int, block: int) -> int:
    """Largest divisor block that Mosaic can lay out: the out-specs use
    blocks of size (.., block) on the token axis, which must be either the
    FULL dimension or a multiple of 128 (see the layout note below). A
    plain halving loop could land on e.g. 64 for t=320 and fail to
    compile; fall back to the full dimension when no legal divisor
    exists."""
    block = min(block, t)
    while t % block:
        block //= 2
    if block < 128 and block != t:
        return t  # full-dim block is always layout-legal
    return block


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
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
    lse_ref[0, 0] = (m + jnp.log(denom))[:, 0]


def _flash_attention_3d(q: Array, k: Array, v: Array, block_q: int):
    """q,k,v: [BH, T, d] -> (o [BH, T, d], lse [BH, 1, T] fp32).

    lse rides in a [BH, 1, T] layout: Mosaic requires every block's last two
    dims to be (8k, 128k) or the full array dims, which a [BH, T] row-block
    (1, block_q) violates; the singleton axis makes the block (1, block_q)
    legal as (1 == full, block_q % 128 == 0 or full).
    """
    bh, t, d = q.shape
    scale = d ** -0.5
    block_q = _pick_block(t, block_q)
    grid = (bh, t // block_q)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, 1, t), jnp.float32)),
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
            out_specs=(
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=bh * t * d * 2 * 4,
            transcendentals=bh * t * t,
        ),
    )(q, k, v)


# ---------------------------------------------------------------------------
# Backward (flash: recompute P from the saved logsumexp, never HBM T x T)
# ---------------------------------------------------------------------------


def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                        dq_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)            # [bq, d]
    k = k_ref[0].astype(jnp.float32)            # [T, d]
    v = v_ref[0].astype(jnp.float32)            # [T, d]
    g = g_ref[0].astype(jnp.float32)            # [bq, d]
    lse = lse_ref[0, 0]                         # [bq]
    delta = delta_ref[0, 0]                     # [bq]
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [bq, T]
    p = jnp.exp(logits - lse[:, None])
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [bq, T]
    ds = p * (dp - delta[:, None])
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _attn_bwd_dkdv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)            # [T, d]
    k = k_ref[0].astype(jnp.float32)            # [bk, d]
    v = v_ref[0].astype(jnp.float32)            # [bk, d]
    g = g_ref[0].astype(jnp.float32)            # [T, d]
    lse = lse_ref[0, 0]                         # [T]
    delta = delta_ref[0, 0]                     # [T]
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [T, bk]
    p = jnp.exp(logits - lse[:, None])
    dv = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # [bk, d]
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [T, bk]
    ds = p * (dp - delta[:, None])
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bk, d]
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_attention_bwd_3d(q, k, v, g, lse, delta, block: int):
    """lse/delta ride as [BH, 1, T] (see _flash_attention_3d layout note)."""
    bh, t, d = q.shape
    scale = d ** -0.5
    blk = _pick_block(t, block)
    grid = (bh, t // blk)
    full = lambda b, i: (b, 0, 0)
    blocked = lambda b, i: (b, i, 0)
    rows_blocked = lambda b, i: (b, 0, i)
    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk, d), blocked, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, d), blocked, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, blk), rows_blocked,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, blk), rows_blocked,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk, d), blocked,
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * t * d,
            bytes_accessed=bh * t * d * 4 * 4,
            transcendentals=bh * t * t,
        ),
    )(q, k, v, g, lse, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkdv_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((bh, t, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), v.dtype)),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, d), blocked, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, d), blocked, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), full, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, blk, d), blocked, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, d), blocked, memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * t * d,
            bytes_accessed=bh * t * d * 4 * 4,
            transcendentals=bh * t * t,
        ),
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------


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
    o3, lse = _flash_attention_3d(q3, k3, v3, block_q)
    o = o3 if shape is None else o3.reshape(*shape, *o3.shape[1:])
    return o, (q, k, v, o3, lse)


def _fa_bwd(block_q, res, g):
    q, k, v, o3, lse = res
    q3, shape = _merge(q)
    k3, _ = _merge(k)
    v3, _ = _merge(v)
    g3, _ = _merge(g)
    # delta_i = sum_d g o (the only O(T d) reduction; stays in XLA).
    # [BH, 1, T] layout to match the lse carried from the forward.
    delta = jnp.sum(g3.astype(jnp.float32) * o3.astype(jnp.float32),
                    axis=-1)[:, None, :]
    dq3, dk3, dv3 = _flash_attention_bwd_3d(q3, k3, v3, g3, lse, delta,
                                            block_q)
    if shape is not None:
        b, h = shape
        t, d = q3.shape[1:]
        dq3 = dq3.reshape(b, h, t, d)
        dk3 = dk3.reshape(b, h, t, d)
        dv3 = dv3.reshape(b, h, t, d)
    return dq3.astype(q.dtype), dk3.astype(k.dtype), dv3.astype(v.dtype)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def reference_attention(q: Array, k: Array, v: Array) -> Array:
    """Plain XLA attention (fp32 softmax) for correctness comparison."""
    d = q.shape[-1]
    logits = jnp.einsum("...td,...sd->...ts",
                        q.astype(jnp.float32) * d**-0.5,
                        k.astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...ts,...sd->...td", p, v)


# ---------------------------------------------------------------------------
# Fused-QKV forward: consume the projection output [B, T, 3C] DIRECTLY
# ---------------------------------------------------------------------------
#
# The measured HLO-traffic attribution (PERF.md r4, scripts/hlo_traffic.py)
# puts 1.18 GB/step of the bench program in layout copies, and the compiled
# module shows transpose+copy PAIRS bracketing every attention einsum: any
# per-head tensor derived from the [B, T, 3C] projection has logical order
# [B, T, heads, d], and the dot canonicalizes to [B, heads, T, d] with a
# materialized copy (~100 MB per attention block at the bench shape). This
# kernel removes the copies STRUCTURALLY: it reads the raw projection
# output (q/k/v head channels are static lane slices: channel index
# (s*heads + h)*d + i for s in {q,k,v}), loops heads in-kernel, and writes
# the merged [B, T, C] output — zero transposes on either side.
#
# Block layout legality (Mosaic: a block's last two dims must be multiples
# of (8, 128) or the full dim): in (1, bq, 3C) and (1, T, 3C) the minor dim
# is the FULL 3C channel axis; out (1, bq, C) minor is full C.
#
# VMEM per program ~ (bq + T) * 3C * itemsize + bq * T * 4 (one head's fp32
# logits): ~1.2 MB at the bench shape (T=256, C=256), ~6.5 MB at the 64px
# SR level (T=1024, C=192 -> full rows) — callers should check
# fused_attention_fits_vmem() and fall back beyond it.


def _attn_fused_kernel(qrow_ref, kvrow_ref, o_ref, *, heads: int,
                       head_dim: int, scale: float):
    _attn_fused_body(qrow_ref[0], kvrow_ref[0], o_ref,
                     heads=heads, head_dim=head_dim, scale=scale)


def _attn_fused_kernel_1ref(row_ref, o_ref, *, heads: int, head_dim: int,
                            scale: float):
    # bq == T: the q rows and the kv rows are the SAME block — one operand,
    # one DMA (the two-ref variant fetches the identical block twice)
    row = row_ref[0]
    _attn_fused_body(row, row, o_ref, heads=heads, head_dim=head_dim,
                     scale=scale)


def _attn_fused_body(qrow, kvrow, o_ref, *, heads: int, head_dim: int,
                     scale: float):
    c = heads * head_dim                  # qrow: [bq, 3C]; kvrow: [T, 3C]
    for h in range(heads):
        lo = h * head_dim
        q = qrow[:, lo:lo + head_dim].astype(jnp.float32)
        k = kvrow[:, c + lo:c + lo + head_dim].astype(jnp.float32)
        v = kvrow[:, 2 * c + lo:2 * c + lo + head_dim]
        logits = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # [bq, T]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        o = jax.lax.dot_general(
            (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype), v,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[0, :, lo:lo + head_dim] = o.astype(o_ref.dtype)


def fused_attention_fits_vmem(t: int, c: int, block_q: int = 256,
                              itemsize: int = 2,
                              budget: int = 12 << 20) -> bool:
    block_q = _pick_block(t, block_q)
    need = (block_q + t) * 3 * c * itemsize + block_q * t * 4 \
        + block_q * c * itemsize
    return need <= budget


def _fused_kernel_call(qkv, heads, block_q):
    b, t, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // heads
    bq = _pick_block(t, block_q)
    cost = pl.CostEstimate(
        flops=4 * b * heads * t * t * head_dim,
        bytes_accessed=b * t * 4 * c * 2,
        transcendentals=b * heads * t * t,
    )
    if bq == t:
        # whole-row grid: the q block and the kv block are the same
        # [1, T, 3C] slab — pass qkv ONCE so each program DMAs it once
        # (the two-operand variant fetches the identical block twice:
        # +125 MB/step at the bench shape)
        return pl.pallas_call(
            functools.partial(_attn_fused_kernel_1ref, heads=heads,
                              head_dim=head_dim, scale=head_dim ** -0.5),
            out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
            grid_spec=pl.GridSpec(
                grid=(b,),
                in_specs=[pl.BlockSpec((1, t, c3), lambda bi: (bi, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            cost_estimate=cost,
        )(qkv)
    out = pl.pallas_call(
        functools.partial(_attn_fused_kernel, heads=heads,
                          head_dim=head_dim, scale=head_dim ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, t // bq),
            in_specs=[
                pl.BlockSpec((1, bq, c3), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, c3), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, c), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=cost,
    )(qkv, qkv)
    return out


def _faf_fwd(qkv, heads, block_q):
    # custom_vjp fwd receives args in their ORIGINAL positions (only bwd
    # gets the nondiff args hoisted to the front)
    return _fused_kernel_call(qkv, heads, block_q), qkv


def _fused_ref(qkv: Array, heads: int) -> Array:
    """XLA reference of the fused path (drives the custom-vjp backward —
    the guidance samplers differentiate through the eps model)."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    r = qkv.reshape(b, t, 3, heads, d)
    q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * d**-0.5,
                        k.astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, c)


def _faf_bwd(heads, block_q, qkv, g):
    _, vjp = jax.vjp(lambda x: _fused_ref(x, heads), qkv)
    return (vjp(g.astype(jnp.float32) if g.dtype != qkv.dtype else g)[0]
            .astype(qkv.dtype),)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_fused(qkv: Array, heads: int,
                          block_q: int = 256) -> Array:
    """softmax(QK^T/sqrt(d))V from the raw projection output.

    qkv: [B, T, 3C] with channel order ((q|k|v)*heads + head)*head_dim —
    exactly `nn.Conv(3C)` as consumed by AttentionBlock's
    reshape(b, T, 3, heads, d). Returns the merged [B, T, C] context.
    """
    return _fused_kernel_call(qkv, heads, block_q)


flash_attention_fused.defvjp(_faf_fwd, _faf_bwd)
