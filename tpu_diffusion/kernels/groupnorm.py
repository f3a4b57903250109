"""Pallas fused GroupNorm(+FiLM)+SiLU kernel for the UNet ResBlocks.

The reference applies GroupNorm32 -> (FiLM scale/shift) -> SiLU as separate
ops (image_diffusion/nn.py:11-13, unet.py:243-351). Under XLA that chain
costs ~3 HBM round trips of the activation tensor (stats pass, normalize
pass, elementwise pass) with an fp32 island in the middle; on a
bandwidth-bound sampler these norms are a top-2 time sink (PERF.md).

This kernel keeps one (H, W, C) image slab in VMEM and does
  y = silu((x - mean_g) * rsqrt(var_g + eps) * gamma * (1 + scale) +
           (beta_film_shifted))
in ONE read + ONE write of bf16 HBM traffic, with fp32 statistics on-chip
(matching GroupNorm32's fp32-stats contract).

Grid: one program per batch element; stats for all groups are computed from
the resident slab. Requires H*W*C * (2 + 4) bytes <= ~12 MB VMEM — true for
every config in this framework (<= 64x64x512). For the 256x256 stretch
config's first level the model falls back to the unfused path.

Inputs are NHWC. `scale`/`shift` are the per-sample FiLM embeddings
([B, C] each, may be None), `gamma`/`beta` the learned affine ([C]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref,
                    *, num_groups: int, eps: float, film: bool,
                    act: str):
    x = x_ref[...].astype(jnp.float32)                  # [BB, H, W, C]
    bb, h, w, c = x.shape
    gsize = c // num_groups
    n = h * w * gsize
    # Per-image channel sums (lane dim kept), then channel->group reduction
    # via a one-hot [C, G] matmul — Mosaic cannot reshape the lane dim into
    # (groups, group_size), but a tiny MXU contraction does the same job.
    s1 = jnp.sum(x, axis=(1, 2))                        # [BB, C]
    s2 = jnp.sum(x * x, axis=(1, 2))                    # [BB, C]
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (ch // gsize == grp).astype(jnp.float32)   # [C, G]
    g1 = jax.lax.dot_general(s1, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BB, G]
    g2 = jax.lax.dot_general(s2, onehot, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BB, G]
    mean_g = g1 / n
    var_g = jnp.maximum(g2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)                 # [BB, G]
    # broadcast group stats back to channels: [BB, G] @ [G, C] (fresh iota
    # one-hot instead of a lane/sublane transpose, which Mosaic dislikes)
    grp_t = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 0)
    ch_t = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 1)
    onehot_t = (ch_t // gsize == grp_t).astype(jnp.float32)  # [G, C]
    mean_c = jax.lax.dot_general(mean_g, onehot_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, onehot_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    gamma = gamma_ref[0, 0].astype(jnp.float32)         # [C]
    beta = beta_ref[0, 0].astype(jnp.float32)           # [C]
    a = rstd_c * gamma                                  # [BB, C]
    b = beta - mean_c * a                               # [BB, C]
    if film:
        scale = scale_ref[:, 0].astype(jnp.float32)     # [BB, C]
        shift = shift_ref[:, 0].astype(jnp.float32)     # [BB, C]
        a = a * (1.0 + scale)
        b = b * (1.0 + scale) + shift
    y = x * a[:, None, None, :] + b[:, None, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_groupnorm_silu(x: Array, gamma: Array, beta: Array,
                         scale: Array | None = None,
                         shift: Array | None = None,
                         num_groups: int = 32, eps: float = 1e-5,
                         act: str = "silu") -> Array:
    """silu(groupnorm(x) [* (1+scale) + shift]) in one fused HBM pass.

    x: [B, H, W, C]; gamma/beta: [C]; scale/shift: [B, C] or None.
    fp32 statistics regardless of x.dtype (GroupNorm32 contract).
    """
    b, h, w, c = x.shape
    if c % num_groups:
        # the one-hot channel->group contraction would silently assign
        # trailing channels to NO group (zero stats -> silu(beta)
        # constants); flax GroupNorm raises on the same input
        raise ValueError(
            f"channels {c} not divisible by num_groups={num_groups}")
    film = scale is not None
    if not film:
        # dummy operands keep one kernel signature (zero extra traffic
        # relative to the activation slab: [B, C] vectors)
        scale = jnp.zeros((b, c), x.dtype)
        shift = jnp.zeros((b, c), x.dtype)
    # images per program: target ~2 MB of fp32 slab so small-resolution
    # norms don't pay per-program grid overhead 64x
    slab_fp32 = h * w * c * 4
    block_b = max(1, min(b, 2_000_000 // max(slab_fp32, 1)))
    while b % block_b:
        block_b -= 1
    grid = (b // block_b,)
    gamma2 = gamma.reshape(1, 1, c)
    beta2 = beta.reshape(1, 1, c)
    scale2 = scale.reshape(b, 1, c)
    shift2 = shift.reshape(b, 1, c)
    vec1 = pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    vecb = pl.BlockSpec((block_b, 1, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    img = pl.BlockSpec((block_b, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps,
                          film=film, act=act),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[img, vec1, vec1, vecb, vecb],
            out_specs=img,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * w * c,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=b * h * w * c,
        ),
    )(x, gamma2, beta2, scale2, shift2)


def reference_groupnorm_silu(x, gamma, beta, scale=None, shift=None,
                             num_groups=32, eps=1e-5, act="silu"):
    """Unfused fp32 reference for correctness tests."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xf - mean) / jnp.sqrt(var + eps)).reshape(b, h, w, c)
    y = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if scale is not None:
        y = (y * (1.0 + scale.astype(jnp.float32))[:, None, None, :]
             + shift.astype(jnp.float32)[:, None, None, :])
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x.dtype)
