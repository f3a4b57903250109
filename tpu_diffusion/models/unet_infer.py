"""Fused-inference UNet forward: the sampler-path twin of
`models/unet.UNetModel` that routes every ResBlock through the Pallas
whole-block megakernel (`kernels/resblock.py`).

Why a separate forward instead of a flag inside the flax module: the
megakernel consumes RAW parameter arrays (it is one pallas_call per
block), while the flax module owns its parameters through submodules. The
engine therefore walks the SAME parameter tree `UNetModel.init` produced
— names (`enc_0_0/Conv_0/kernel`, ...) are pinned by
tests/test_kernels.py asserting forward equality against `model.apply` —
so any trained/EMA checkpoint drops in unchanged. Training and gradients
keep the flax path; this is the inference engine for the HBM-bound
sampling loop (PERF.md: ~56% of DDIM step time was zero-FLOP norm/
elementwise traffic; the megakernel folds it into the convs' one HBM
round trip).

Mirrors UNetModel.__call__ exactly (reference unet.py:498-576 wiring):
encoder/middle/decoder with skip concats, attention at the configured
resolutions (layout-preserving XLA einsums at T<1024, identical to the
flax path), Downsample/Upsample convs, fp32 zero-init conv_out, and the
encode/decode cache modes used by encoder-reuse sampling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpu_diffusion.kernels.resblock import fused_resblock, pick_block_batch
from tpu_diffusion.models.nn import (avg_pool_2x, nearest_upsample,
                                     timestep_embedding)
from tpu_diffusion.models.unet import UNetModel, attention_ds

Array = jax.Array


def _dense(p, x, dtype):
    return (x.astype(dtype) @ p["kernel"].astype(dtype)
            + p["bias"].astype(dtype))


def _conv(p, x, dtype, strides=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), strides, "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(dtype)


def _groupnorm(p, x, num_groups=32, eps=1e-5, dtype=None):
    """GroupNorm32 semantics: fp32 statistics, optional bf16 normalize."""
    c = x.shape[-1]
    g = min(num_groups, c)
    while c % g:
        g -= 1
    xf = x.astype(jnp.float32)
    xg = xf.reshape(*x.shape[:-1], g, c // g)
    red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = xg.mean(axis=red, keepdims=True)
    var = xg.var(axis=red, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype or x.dtype)


class FusedUNetInference:
    """fn-object: build once from (model, params), call like model.apply.

    `resblock="pallas"` uses the megakernel wherever the slab fits VMEM
    (falls back to jnp per block otherwise); `"jnp"` runs the pure-jnp
    mirror everywhere (the CPU/test path — also what gradients would
    need, but use the flax module for training)."""

    def __init__(self, model: UNetModel, params, *, resblock: str = "pallas",
                 interpret: bool = False, kernel_min_tokens: int = 1024):
        assert not model.resblock_updown, "resblock up/down not supported"
        assert model.num_classes is None, "class-conditional: use flax path"
        self.m = model
        self.p = params["params"] if "params" in params else params
        self.resblock = resblock
        self.interpret = interpret
        # measured crossover (PERF.md r4): the megakernel wins ~1.5x at
        # 32x32 slabs (per-image traffic dominates) but loses to XLA's
        # cross-block fusions at deeper/smaller levels — the kernel
        # engages only at >= kernel_min_tokens spatial positions. 0 = all.
        self.kernel_min_tokens = kernel_min_tokens
        self.attn_ds = tuple(model.attention_resolutions)

    # -- blocks ------------------------------------------------------------
    def _resblock(self, name: str, h: Array, emb: Array) -> Array:
        m, p = self.m, self.p[name]
        cout = p["Conv_0"]["kernel"].shape[-1]
        emb_out = _dense(p["Dense_0"], jax.nn.silu(emb), m.dtype)
        if m.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            ea, eb = 1.0 + scale.astype(jnp.float32), shift
        else:
            ea, eb = None, emb_out
        gn1 = p["GroupNorm32_0"]["GroupNorm_0"]
        gn2 = p["GroupNorm32_1"]["GroupNorm_0"]
        skip = p.get("Conv_2")
        wskip = skip["kernel"][0, 0] if skip else None
        bskip = skip["bias"] if skip else None
        b, hh, ww, cin = h.shape
        use_kernel = (self.resblock == "pallas"
                      and hh * ww >= self.kernel_min_tokens
                      and pick_block_batch(b, hh, ww, cin, cout) is not None)
        fn = fused_resblock if use_kernel else _resblock_jnp
        kw = {"interpret": self.interpret} if use_kernel else {}
        return fn(h, gn1["scale"], gn1["bias"],
                  p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                  gn2["scale"], gn2["bias"], ea, eb,
                  p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
                  wskip, bskip, **kw)

    def _attention(self, name: str, x: Array) -> Array:
        m, p = self.m, self.p[name]
        b, hh, ww, c = x.shape
        heads = (m.num_heads if m.num_head_channels == -1
                 else c // m.num_head_channels)
        hd = c // heads
        y = _groupnorm(p["GroupNorm32_0"]["GroupNorm_0"], x,
                       dtype=m.norm_dtype or x.dtype)
        y = y.reshape(b, hh * ww, c)
        qkv = (y.astype(m.dtype) @ p["qkv"]["kernel"][0].astype(m.dtype)
               + p["qkv"]["bias"].astype(m.dtype))
        r = qkv.reshape(b, hh * ww, 3, heads, hd)
        q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, hh * ww, c)
        out = (out.astype(m.dtype) @ p["Conv_0"]["kernel"][0].astype(m.dtype)
               + p["Conv_0"]["bias"].astype(m.dtype))
        return x + out.reshape(b, hh, ww, c)

    # -- forward -----------------------------------------------------------
    def __call__(self, x: Array, t: Array, *, mode: str = "full",
                 cache=None) -> Array:
        m = self.m
        ch0 = m.model_channels
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
        emb = timestep_embedding(t * m.time_scale, ch0)
        emb = _dense(self.p["time_dense_0"], emb, m.dtype)
        emb = _dense(self.p["time_dense_1"], jax.nn.silu(emb), m.dtype)

        if mode in ("full", "encode"):
            h = _conv(self.p["conv_in"], x, m.dtype)
            hs = [h]
            ds = 1
            for level, mult in enumerate(m.channel_mult):
                for i in range(m.num_res_blocks):
                    h = self._resblock(f"enc_{level}_{i}", h, emb)
                    if ds in self.attn_ds:
                        h = self._attention(f"enc_attn_{level}_{i}", h)
                    hs.append(h)
                if level != len(m.channel_mult) - 1:
                    h = _conv(self.p[f"down_{level}"]["Conv_0"], h, m.dtype,
                              strides=(2, 2))
                    hs.append(h)
                    ds *= 2
            if mode == "encode":
                return h, tuple(hs)
        else:
            assert cache is not None, "mode='decode' requires cache"
            h, hs_tuple = cache
            hs = list(hs_tuple)
            ds = 2 ** (len(m.channel_mult) - 1)

        h = self._resblock("mid_res_0", h, emb)
        h = self._attention("mid_attn", h)
        h = self._resblock("mid_res_1", h, emb)

        for level, mult in reversed(list(enumerate(m.channel_mult))):
            for i in range(m.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = self._resblock(f"dec_{level}_{i}", h, emb)
                if ds in self.attn_ds:
                    h = self._attention(f"dec_attn_{level}_{i}", h)
                if level and i == m.num_res_blocks:
                    h = _conv(self.p[f"up_{level}"]["Conv_0"],
                              nearest_upsample(h), m.dtype)
                    ds //= 2
        assert not hs
        h = jax.nn.silu(_groupnorm(self.p["out_norm"]["GroupNorm_0"], h,
                                   dtype=m.norm_dtype or h.dtype))
        return _conv(self.p["conv_out"], h, jnp.float32)


def _resblock_jnp(h, gn1s, gn1b, w1, b1, gn2s, gn2b, ea, eb, w2, b2,
                  wskip, bskip):
    from tpu_diffusion.kernels.resblock import resblock_reference
    return resblock_reference(h, gn1s, gn1b, w1, b1, gn2s, gn2b, ea, eb,
                              w2, b2, wskip, bskip)


def make_fused_apply(model: UNetModel, params, *, resblock: str = "pallas",
                     interpret: bool = False, kernel_min_tokens: int = 1024):
    """(model, params) -> fn(x, t, mode=..., cache=...) matching
    `model.apply(params, x, t, ...)` — drop-in for samplers."""
    return FusedUNetInference(model, params, resblock=resblock,
                              interpret=interpret,
                              kernel_min_tokens=kernel_min_tokens)
