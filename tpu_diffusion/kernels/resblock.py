"""Pallas whole-ResBlock megakernel (forward / sampling path).

The r2/r3 profiles pin ~56% of DDIM step time on zero-FLOP GroupNorm +
elementwise chains (PERF.md "Where the time goes"); the per-op fused-norm
kernel LOST 1.5x to pallas_call boundary costs (~130 us/call: producer
fusions forced to materialize + Mosaic spin-up at tiny slab sizes —
PERF.md negative result). This kernel attacks the same traffic at the
granularity where the boundary *is* the HBM boundary: one `pallas_call`
computes an entire ResBlock (reference unet.py:243-351)

    h  = silu(GN1(x))
    h  = conv3x3(h) + b1
    h  = GN2(h) * film_scale + film_shift        (use_scale_shift_norm)
         -- or --  h += emb;  h = silu(GN2(h))   (plain mode)
    h  = silu(h)                                  (scale-shift mode)
    h  = conv3x3_zero_init(h) + b2
    out = (x | conv1x1(x)) + h

reading x from HBM ONCE and writing out ONCE. Statistics are fp32
on-chip (GroupNorm32 contract); convs are 9 shifted MXU matmuls over a
zero-padded VMEM slab; the per-sample FiLM vectors come in precomputed
([B, Cout] — the Dense(silu(emb)) projection is a few KB and stays in
XLA). Inference-only by design: the flagship bench/sampler path never
differentiates through it (training keeps the XLA ResBlock).

HBM traffic per block: in + out + weights, vs XLA's additional ~3
activation round-trips for the two norm chains — the dominant share of
the 502 GB -> 144 GB analytic-floor gap (BENCH_r03).

Grid: one program per batch sub-block; `block_batch` auto-sized to keep
the working set under the VMEM budget. Requires the whole (padded) image
slab resident: (H+2)(W+2)*max(Cin,Cout) * ~12 bytes * block_batch <=
budget — true for every CIFAR/MNIST geometry and the deep levels of the
64/256 px configs; callers fall back to the XLA block elsewhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_BUDGET = 10 * 1024 * 1024


def _group_onehot(c: int, groups: int, transpose: bool = False):
    """[C, G] (or [G, C]) one-hot matrix built from iota — channel->group
    reductions ride the MXU instead of lane-dim reshapes (Mosaic cannot
    reshape the lane dim into (groups, group_size); same trick as
    kernels/groupnorm.py)."""
    if transpose:
        grp = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
        ch = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    else:
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
        grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == grp).astype(jnp.float32)


def _silu(v: Array) -> Array:
    """SiLU with an explicit fp32 sigmoid: Mosaic's logistic lowering on a
    bf16 vector emits an invalid f32->bf16 vector.broadcast (verifier
    error 'source operand and result have same element type')."""
    sig = 1.0 / (1.0 + jnp.exp(-v.astype(jnp.float32)))
    return v * sig.astype(v.dtype)


def _gn_stats(xf: Array, groups: int, eps: float):
    """Per-image per-group mean / rstd broadcast back to channels, fp32.
    xf: [B, T, C] (any float dtype; sums accumulate fp32 on the MXU)."""
    b, t, c = xf.shape
    n = t * (c // groups)
    s1 = jnp.sum(xf.astype(jnp.float32), axis=1)        # [B, C]
    s2 = jnp.sum(jnp.square(xf.astype(jnp.float32)), axis=1)
    oh = _group_onehot(c, groups)
    g1 = jax.lax.dot_general(s1, oh, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    g2 = jax.lax.dot_general(s2, oh, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mean_g = g1 / n
    var_g = jnp.maximum(g2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)                 # [B, G]
    oh_t = _group_onehot(c, groups, transpose=True)
    mean_c = jax.lax.dot_general(mean_g, oh_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, oh_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return mean_c, rstd_c                               # [B, C] each


def _groupnorm_f32(xf: Array, gamma: Array, beta: Array, groups: int,
                   eps: float) -> Array:
    """fp32 GroupNorm over a [B, T, C] slab (stats per image per group)."""
    mean_c, rstd_c = _gn_stats(xf, groups, eps)
    y = (xf - mean_c[:, None, :]) * rstd_c[:, None, :]
    return y * gamma[None, None, :] + beta[None, None, :]


def _conv3x3(y: Array, w: Array, bias: Array, compute_dtype) -> Array:
    """SAME 3x3 conv over a resident [B, H, W, Cin] slab as 9 shifted
    matmuls (cross-correlation, flax nn.Conv orientation). Returns fp32
    [B, H*W, Cout].

    The shifts are token-axis shifts of the FLAT [B*H*W, Cin] slab
    (static slice + zero-block concat — both plain Mosaic ops) with iota
    boundary masks killing the rows that crossed an image/row edge —
    everything stays 2D: sublane shift + VPU mask + MXU matmul. The first
    version built a zero-padded 4D slab and took 9 strided 4D
    slice+reshapes, which Mosaic turned into relayout copies."""
    b, h, wd, cin = y.shape
    cout = w.shape[-1]
    m = b * h * wd
    yflat = y.reshape(m, cin)
    # token coordinates (y = t//W mod H, x = t mod W), 2D iota
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    yy = (t_idx // wd) % h
    xx = t_idx % wd
    acc = jnp.zeros((m, cout), jnp.float32)
    zero_row = jnp.zeros((abs(wd) + 1, cin), yflat.dtype)
    for ky in range(3):
        for kx in range(3):
            dy, dx = ky - 1, kx - 1
            d = dy * wd + dx            # out[t] reads in[t + d]
            if d > 0:
                shifted = jnp.concatenate([yflat[d:], zero_row[:d]], 0)
            elif d < 0:
                shifted = jnp.concatenate([zero_row[:-d], yflat[:m + d]], 0)
            else:
                shifted = yflat
            valid = ((yy + dy >= 0) & (yy + dy < h)
                     & (xx + dx >= 0) & (xx + dx < wd))
            shifted = jnp.where(valid, shifted, 0).astype(compute_dtype)
            acc = acc + jax.lax.dot_general(
                shifted, w[ky, kx].astype(compute_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return (acc + bias.astype(jnp.float32)[None, :]).reshape(b, h * wd,
                                                             cout)


def _resblock_kernel(x_ref, gn1_g_ref, gn1_b_ref, w1_ref, b1_ref,
                     gn2_g_ref, gn2_b_ref, emb_a_ref, emb_b_ref,
                     w2_ref, b2_ref, wskip_ref, bskip_ref, o_ref, *,
                     groups1: int, groups2: int, eps: float,
                     scale_shift: bool, has_skip: bool, compute_dtype):
    x = x_ref[...]                                       # [Bb, H, W, Cin]
    bb, h, w, cin = x.shape
    cout = w1_ref.shape[-1]
    cd = compute_dtype
    xflat = x.reshape(bb, h * w, cin)

    # GN1 + SiLU: fp32 statistics (MXU-accumulated), compute-dtype
    # normalize/activation — the same contract as GroupNorm32 with
    # norm_dtype=bf16 (fp32 stats, bf16 elementwise), at half the VPU
    # traffic of the first all-fp32 kernel version.
    mean_c, rstd_c = _gn_stats(xflat, groups1, eps)
    g1w = (gn1_g_ref[...].astype(jnp.float32) * rstd_c).astype(cd)
    g1b = (gn1_b_ref[...].astype(jnp.float32)
           - gn1_g_ref[...].astype(jnp.float32) * rstd_c * mean_c
           ).astype(cd)                                  # [Bb, Cin] each
    y = xflat.astype(cd) * g1w[:, None, :] + g1b[:, None, :]
    y = _silu(y)
    y = y.astype(cd).reshape(bb, h, w, cin)

    hmid = _conv3x3(y, w1_ref[...], b1_ref[...], compute_dtype)  # [Bb,T,Co]

    # FiLM vectors arrive as [B/Bb, Bb, Cout] with a (1, Bb, Cout) block:
    # a flat (Bb, Cout) BlockSpec violates the 8-sublane tiling rule when
    # Bb < 8, and a dynamic row-slice of a full VMEM ref crashed the
    # Mosaic compile helper outright; the leading-grid-dim reshape keeps
    # the last two block dims equal to the array dims (always legal).
    emb_a = emb_a_ref[0].astype(jnp.float32)                   # [Bb, Cout]
    emb_b = emb_b_ref[0].astype(jnp.float32)
    # GN2 (+FiLM): fold gamma/rstd/FiLM-scale into ONE per-(image,channel)
    # affine so the [Bb, T, Cout] slab sees a single multiply-add pass
    gamma2 = gn2_g_ref[...].astype(jnp.float32)
    beta2 = gn2_b_ref[...].astype(jnp.float32)
    if not scale_shift:
        hmid = hmid + emb_b[:, None, :]
    mean2, rstd2 = _gn_stats(hmid, groups2, eps)
    scale2 = gamma2 * rstd2                              # [Bb, Cout]
    shift2 = beta2 - scale2 * mean2
    if scale_shift:
        shift2 = shift2 * emb_a + emb_b
        scale2 = scale2 * emb_a
    h2 = hmid.astype(cd) * scale2.astype(cd)[:, None, :] \
        + shift2.astype(cd)[:, None, :]
    h2 = _silu(h2)
    h2 = h2.astype(cd).reshape(bb, h, w, cout)

    out = _conv3x3(h2, w2_ref[...], b2_ref[...], compute_dtype)  # fp32

    if has_skip:
        skip = jax.lax.dot_general(
            xflat.reshape(bb * h * w, cin).astype(cd),
            wskip_ref[...].astype(cd),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        skip = (skip + bskip_ref[...].astype(jnp.float32)[None, :]
                ).reshape(bb, h * w, cout)
    else:
        skip = xflat.astype(jnp.float32)
    o_ref[...] = (skip + out).astype(o_ref.dtype).reshape(bb, h, w, cout)


def _num_groups(c: int, groups: int = 32) -> int:
    g = min(groups, c)
    while c % g:
        g -= 1
    return g


def pick_block_batch(batch: int, h: int, w: int, cin: int, cout: int,
                     budget: int = _VMEM_BUDGET) -> Optional[int]:
    """Largest divisor of `batch` whose kernel working set fits VMEM;
    None when even one image does not fit (caller must fall back)."""
    per_img = ((h + 2) * (w + 2) * max(cin, cout) * 2    # shifted slab bf16
               + h * w * cout * 4                        # fp32 accumulator
               + 2 * h * w * (cin + cout) * 2            # in+out, 2x-buffered
               + h * w * max(cin, cout) * 2)             # norm temp (bf16)
    # grid operands are double-buffered by the Pallas pipeline; weights use
    # a constant index_map but budget 2x anyway (measured: the analytic
    # estimate ran 1.75M over the 16M scoped-vmem limit without it)
    weights = 2 * (9 * cin * cout + 9 * cout * cout + cin * cout) * 2
    for bb in range(batch, 0, -1):
        # bb*H*W <= 2048: Mosaic's compile time/memory explodes past
        # ~2048-row slabs (the 32x32 bb=4 kernel reproducibly crashed the
        # compile helper; bb=2 compiles in seconds)
        if (batch % bb == 0 and bb * per_img + weights <= budget
                and bb * h * w <= 2048):
            return bb
    return None


def fused_resblock(x: Array, gn1_scale: Array, gn1_bias: Array,
                   w1: Array, b1: Array, gn2_scale: Array, gn2_bias: Array,
                   emb_scale: Optional[Array], emb_shift: Array,
                   w2: Array, b2: Array,
                   wskip: Optional[Array] = None,
                   bskip: Optional[Array] = None, *,
                   eps: float = 1e-5, groups: int = 32,
                   block_batch: Optional[int] = None,
                   interpret: bool = False) -> Array:
    """One-HBM-pass ResBlock forward.

    `emb_scale`/`emb_shift`: per-sample [B, Cout] FiLM vectors. Scale-shift
    mode runs `GN2(h)*emb_scale + emb_shift` (pass emb_scale = 1 + scale);
    `emb_scale=None` selects the additive mode `silu(GN2(h + emb_shift))`.
    `wskip` ([Cin, Cout]) enables the 1x1 skip projection. Weights follow
    flax nn.Conv layout ([3, 3, Cin, Cout]).
    """
    b, h, w, cin = x.shape
    cout = w1.shape[-1]
    scale_shift = emb_scale is not None
    has_skip = wskip is not None
    if block_batch is None:
        block_batch = pick_block_batch(b, h, w, cin, cout)
        if block_batch is None:
            raise ValueError(f"resblock slab does not fit VMEM: "
                             f"{(b, h, w, cin, cout)}")
    compute_dtype = (jnp.bfloat16 if x.dtype == jnp.bfloat16
                     else jnp.float32)
    if emb_scale is None:
        emb_scale = jnp.zeros_like(emb_shift)  # placeholder operand
    if wskip is None:
        wskip = jnp.zeros((cin, 1), x.dtype)  # placeholder operand
        bskip = jnp.zeros((1,), x.dtype)
    if bskip is None:
        bskip = jnp.zeros((cout,), x.dtype)

    grid = (b // block_batch,)
    emb_scale = emb_scale.reshape(b // block_batch, block_batch, cout)
    emb_shift = emb_shift.reshape(b // block_batch, block_batch, cout)
    emb_spec = pl.BlockSpec((1, block_batch, cout), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    batched4 = pl.BlockSpec((block_batch, h, w, cin), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _resblock_kernel, groups1=_num_groups(cin, groups),
        groups2=_num_groups(cout, groups), eps=eps,
        scale_shift=scale_shift, has_skip=has_skip,
        compute_dtype=compute_dtype)
    flops = (2 * b * h * w * (9 * cin * cout + 9 * cout * cout
                              + (cin * cout if has_skip else 0)))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            batched4,
            full(cin), full(cin),                        # gn1
            full(3, 3, cin, cout), full(cout),           # conv1
            full(cout), full(cout),                      # gn2
            emb_spec, emb_spec,                          # emb a/b
            full(3, 3, cout, cout), full(cout),          # conv2
            full(*wskip.shape), full(*bskip.shape),      # skip 1x1
        ],
        out_specs=pl.BlockSpec((block_batch, h, w, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + b * h * w * cout) * x.dtype.itemsize,
            transcendentals=2 * b * h * w * max(cin, cout)),
        interpret=interpret,
    )(x, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias,
      emb_scale, emb_shift, w2, b2, wskip, bskip)


def resblock_reference(x, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias,
                       emb_scale, emb_shift, w2, b2, wskip=None, bskip=None,
                       *, eps: float = 1e-5, groups: int = 32):
    """Pure-jnp mirror of the kernel math (fp32 stats, flax conv
    orientation) — the numerics oracle for tests/test_kernels.py."""
    b, h, w, cin = x.shape
    cout = w1.shape[-1]

    def gn(z, gamma, beta):
        g = _num_groups(z.shape[-1], groups)
        zf = z.astype(jnp.float32).reshape(b, h * w, g, z.shape[-1] // g)
        mean = zf.mean(axis=(1, 3), keepdims=True)
        var = zf.var(axis=(1, 3), keepdims=True)
        y = ((zf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h * w,
                                                             z.shape[-1])
        return y * gamma + beta

    def conv(z, wk, bk):
        return jax.lax.conv_general_dilated(
            z, wk.astype(z.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + bk.astype(jnp.float32)

    y = gn(x, gn1_scale, gn1_bias)
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype).reshape(b, h, w, cin)
    hmid = conv(y, w1, b1)                               # fp32 NHWC
    if emb_scale is not None:
        h2 = gn(hmid.reshape(b, h, w, cout), gn2_scale, gn2_bias)
        h2 = (h2 * emb_scale[:, None, :].astype(jnp.float32)
              + emb_shift[:, None, :].astype(jnp.float32))
    else:
        hmid = hmid + emb_shift[:, None, None, :].astype(jnp.float32)
        h2 = gn(hmid.reshape(b, h, w, cout), gn2_scale, gn2_bias)
    h2 = (h2 * jax.nn.sigmoid(h2)).astype(x.dtype).reshape(b, h, w, cout)
    out = conv(h2, w2, b2)
    if wskip is not None:
        skip = jnp.einsum("bhwc,cd->bhwd", x.astype(x.dtype),
                          wskip.astype(x.dtype),
                          preferred_element_type=jnp.float32)
        skip = skip + bskip.astype(jnp.float32)
    else:
        skip = x.astype(jnp.float32)
    return (skip + out).astype(x.dtype)
