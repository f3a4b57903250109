"""Guided-diffusion style UNet, rebuilt in Flax for TPU.

Feature-parity target: `amortised diffusion/image_diffusion/unet.py`
(`UNetModel` :490-728, `create_model` :43-125) and the torchcfm wrappers the
CFM scripts import (`UNetModelWrapper`, `InPaintModelWrapper`,
`SuperResModelWrapper` — `mnist/train_mnist.py:34`, `mnist/train_mnist_hy.py:36`).

TPU-native design decisions (not a port):
  * NHWC layout end to end; channel-concat conditioning on the last axis.
  * bf16 activations with fp32 GroupNorm / softmax / output head.
  * attention is one dense fused einsum per resolution by default, with a
    Pallas flash-attention kernel (`tpu_diffusion.kernels.attention`) behind
    `attention_impl="pallas"` for long token counts.
  * gradient checkpointing via `nn.remat` on ResBlocks (`use_checkpoint`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_diffusion.models.nn import (FusedNormAct, GroupNorm32, avg_pool_2x,
                                     nearest_upsample, timestep_embedding,
                                     zero_init_conv)

Array = jax.Array

# Trace-time attention-impl log (same pattern as parallel.sp.sp_decisions):
# every AttentionBlock impl resolution is recorded so harness code (the
# 256px stretch bench, tests) can ASSERT the flash path actually engaged
# instead of trusting the "auto" heuristic silently falling back.
_ATTN_DECISIONS: list = []


def reset_attn_decisions() -> None:
    _ATTN_DECISIONS.clear()


def attn_decisions() -> list:
    """[{"impl": "pallas"|"xla"|"ring", "tokens": T, "heads": H}, ...] in
    trace order since the last reset."""
    return list(_ATTN_DECISIONS)


class ResBlock(nn.Module):
    """Residual block with FiLM time conditioning
    (reference unet.py:243-351)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype | None = None  # None -> fp32 norm (reference)
    norm_impl: str = "xla"  # "xla" | "fused" (Pallas GroupNorm+FiLM+SiLU)

    @nn.compact
    def __call__(self, x: Array, emb: Array, deterministic: bool = True
                 ) -> Array:
        # `deterministic` is positional-friendly so nn.remat can mark it
        # static (static_argnums=(3,)) under use_checkpoint
        fused = self.norm_impl == "fused"
        if fused:
            h = FusedNormAct()(x)
        else:
            h = nn.silu(GroupNorm32(dtype=self.norm_dtype)(x))
        if self.up:
            h = nearest_upsample(h)
            x = nearest_upsample(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype)(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels, dtype=self.dtype)(nn.silu(emb))

        if self.use_scale_shift_norm:
            if fused:
                h = FusedNormAct()(h, film=emb_out)
            else:
                scale, shift = jnp.split(emb_out[:, None, None, :], 2,
                                         axis=-1)
                h = GroupNorm32(dtype=self.norm_dtype)(h) * (1 + scale
                                                             ) + shift
                h = nn.silu(h)
        else:
            h = h + emb_out[:, None, None, :]
            if fused:
                h = FusedNormAct()(h)
            else:
                h = nn.silu(GroupNorm32(dtype=self.norm_dtype)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = zero_init_conv(self.out_channels, dtype=self.dtype)(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened HxW tokens
    (reference unet.py:354-401 + QKVAttention :455-487)."""

    num_heads: int = 1
    num_head_channels: int = -1
    impl: str = "xla"  # "xla" | "pallas"
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype | None = None
    norm_impl: str = "xla"
    sp_mesh: object = None  # Mesh -> token-axis-sharded ring attention

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        if self.num_head_channels > 0 and c % self.num_head_channels:
            raise ValueError(
                f"channels {c} not divisible by num_head_channels="
                f"{self.num_head_channels} (the reference asserts this; "
                f"floor-division would silently change head geometry)")
        heads = (c // self.num_head_channels
                 if self.num_head_channels > 0 else self.num_heads)
        if c % heads:
            raise ValueError(f"channels {c} not divisible by {heads} heads")
        head_dim = c // heads

        if self.norm_impl == "fused":
            y = FusedNormAct(act="none")(x).reshape(b, h * w, c)
        else:
            y = GroupNorm32(dtype=self.norm_dtype)(x).reshape(b, h * w, c)
        qkv = nn.Conv(3 * c, (1,), dtype=self.dtype, name="qkv")(y)

        # "auto": XLA dense below 1024 tokens, Pallas flash at/above — the
        # crossover measured on the v5e (PERF.md: XLA 8us vs Pallas 29us at
        # T=256; Pallas 2.2x faster at T=1024, 3.1x at T=4096).
        impl = self.impl
        if impl == "auto":
            from tpu_diffusion.models.nn import effective_platform
            on_tpu = effective_platform() == "tpu"
            impl = "pallas" if (on_tpu and h * w >= 1024) else "xla"
        needs_bhtd = impl == "pallas" or self.sp_mesh is not None

        out = None
        if impl == "pallas_fused" and self.sp_mesh is None:
            # fused-QKV Pallas path: consumes the raw [b,T,3c] projection
            # (static lane slices per head inside the kernel) and writes
            # the merged context — removes the transpose+copy pairs that
            # bracket the XLA einsums (1.18 GB/step measured, PERF.md r4)
            from tpu_diffusion.kernels.attention import (
                flash_attention_fused, fused_attention_fits_vmem)
            if fused_attention_fits_vmem(h * w, c,
                                         itemsize=jnp.dtype(
                                             self.dtype).itemsize):
                out = flash_attention_fused(qkv, heads)
                _ATTN_DECISIONS.append({"impl": "pallas_fused",
                                        "tokens": h * w, "heads": heads})
            # else: fall through to the dense XLA path below
        if needs_bhtd:
            q, k, v = jnp.split(qkv.reshape(b, h * w, 3, heads, head_dim)
                                .transpose(2, 0, 3, 1, 4), 3, axis=0)
            q, k, v = q[0], k[0], v[0]  # [b, heads, T, d]
            sp_out = None
            if self.sp_mesh is not None:
                from tpu_diffusion.parallel.sp import maybe_sequence_parallel
                sp_out = maybe_sequence_parallel(q, k, v, self.sp_mesh)
            if sp_out is not None:
                out = sp_out
                _ATTN_DECISIONS.append({"impl": "ring", "tokens": h * w,
                                        "heads": heads})
            elif impl == "pallas":
                from tpu_diffusion.kernels.attention import flash_attention
                out = flash_attention(q, k, v)
                _ATTN_DECISIONS.append({"impl": "pallas", "tokens": h * w,
                                        "heads": heads})
            # else: sp declined (token count not divisible by the model
            # axis) and impl resolved to XLA — fall through to the dense
            # path below rather than forcing the flash kernel (which
            # crashes off-TPU and is ~3.6x slower at T=256).
            if out is not None:
                out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        if out is None:
            # layout-preserving XLA path: heads stay in the trailing axes
            # ("bqhd,bkhd->bhqk" / "bhqk,bkhd->bqhd"), so no explicit
            # [b,T,heads,d] <-> [b,heads,T,d] copies bracket the einsums —
            # they were part of the 9% copy/layout time in the DDIM
            # profile (PERF.md).
            _ATTN_DECISIONS.append({"impl": "xla", "tokens": h * w,
                                    "heads": heads})
            r = qkv.reshape(b, h * w, 3, heads, head_dim)
            q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]  # [b, T, heads, d]
            scale = head_dim ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v
                             ).reshape(b, h * w, c)

        out = zero_init_conv(c, (1,), dtype=self.dtype)(out)
        return x + out.reshape(b, h, w, c)


class Downsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_conv:
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding="SAME", dtype=self.dtype)(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nearest_upsample(x)
        if self.use_conv:
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype)(x)
        return x


class UNetModel(nn.Module):
    """The denoiser backbone. Call: model(x_nhwc, t[, y]) -> [B,H,W,out_ch]."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_checkpoint: bool = False
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype | None = None  # None -> fp32 norms (reference)
    norm_impl: str = "xla"  # "fused" = Pallas GroupNorm+FiLM+SiLU kernel
    sp_mesh: object = None  # Mesh -> token-axis ring attention (SURVEY §5.7)
    time_scale: float = 1.0  # multiply t before embedding (CFM uses 1000.0)

    @nn.compact
    def __call__(self, x: Array, t: Array, y: Optional[Array] = None, *,
                 train: bool = False, mode: str = "full",
                 cache=None):
        """mode="full" is the plain forward. mode="encode" returns the
        `(bottleneck, skip-stack)` cache; mode="decode" consumes such a
        cache (computed at a nearby timestep) and runs only middle+decoder
        with the CURRENT timestep embedding — encoder-feature reuse across
        adjacent sampler steps ("Faster Diffusion", arXiv:2312.09608; see
        `sampling.ancestral.make_ddim_sampler(encoder_reuse=...)`). All
        submodules carry explicit names so every mode binds the same
        parameter tree."""
        assert mode in ("full", "encode", "decode"), mode
        ch0 = self.model_channels
        time_dim = 4 * ch0
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32),
                             (x.shape[0],))
        emb = timestep_embedding(t * self.time_scale, ch0)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_dense_0")(emb)
        emb = nn.Dense(time_dim, dtype=self.dtype,
                       name="time_dense_1")(nn.silu(emb))
        if self.num_classes is not None:
            assert y is not None, "class-conditional model requires labels"
            emb = emb + nn.Embed(self.num_classes, time_dim,
                                 dtype=self.dtype, name="class_emb")(y)

        block = ResBlock
        if self.use_checkpoint:
            # static_argnums counts self as 0 -> 3 is `deterministic`;
            # without it the traced bool reaches flax Dropout's python
            # `if` and raises TracerBoolConversionError whenever
            # dropout > 0 (deterministic must be passed positionally)
            block = nn.remat(ResBlock, static_argnums=(3,))

        def res(h, out_ch, name, *, up=False, down=False):
            return block(out_ch, self.dropout, self.use_scale_shift_norm,
                         up, down, self.dtype, self.norm_dtype,
                         self.norm_impl, name=name)(
                             h, emb, not train)

        def attn(h, name):
            return AttentionBlock(self.num_heads, self.num_head_channels,
                                  self.attention_impl, self.dtype,
                                  self.norm_dtype, self.norm_impl,
                                  self.sp_mesh, name=name)(h)

        if mode in ("full", "encode"):
            h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv_in")(x.astype(self.dtype))
            hs = [h]
            ds = 1
            # --- encoder ---
            for level, mult in enumerate(self.channel_mult):
                for i in range(self.num_res_blocks):
                    h = res(h, mult * ch0, f"enc_{level}_{i}")
                    if ds in self.attention_resolutions:
                        h = attn(h, f"enc_attn_{level}_{i}")
                    hs.append(h)
                if level != len(self.channel_mult) - 1:
                    out_ch = mult * ch0
                    if self.resblock_updown:
                        h = res(h, out_ch, f"down_{level}", down=True)
                    else:
                        h = Downsample(out_ch, self.conv_resample,
                                       self.dtype, name=f"down_{level}")(h)
                    hs.append(h)
                    ds *= 2
            if mode == "encode":
                return h, tuple(hs)
        else:
            assert cache is not None, "mode='decode' requires cache"
            h, hs_tuple = cache
            hs = list(hs_tuple)
            ds = 2 ** (len(self.channel_mult) - 1)

        # --- middle ---
        mid_ch = self.channel_mult[-1] * ch0
        h = res(h, mid_ch, "mid_res_0")
        h = attn(h, "mid_attn")
        h = res(h, mid_ch, "mid_res_1")
        # --- decoder ---
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(h, mult * ch0, f"dec_{level}_{i}")
                if ds in self.attention_resolutions:
                    h = attn(h, f"dec_attn_{level}_{i}")
                if level and i == self.num_res_blocks:
                    out_ch = mult * ch0
                    if self.resblock_updown:
                        h = res(h, out_ch, f"up_{level}", up=True)
                    else:
                        h = Upsample(out_ch, self.conv_resample,
                                     self.dtype, name=f"up_{level}")(h)
                    ds //= 2
        assert not hs
        if self.norm_impl == "fused":
            h = FusedNormAct(name="out_norm")(h)
        else:
            h = nn.silu(GroupNorm32(dtype=self.norm_dtype,
                                    name="out_norm")(h))
        h = zero_init_conv(self.out_channels, dtype=jnp.float32,
                           name="conv_out")(
            h.astype(jnp.float32))
        return h


# ---------------------------------------------------------------------------
# Factory (reference unet.py:43-105)
# ---------------------------------------------------------------------------

_DEFAULT_CHANNEL_MULT = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 2, 2),
    28: (1, 2, 2),
}


def attention_ds(image_size: int, attention_resolutions: str | Sequence[int]
                 ) -> Tuple[int, ...]:
    """Parse "16,8"-style resolution strings into downsample rates
    (reference unet.py:77-84)."""
    if isinstance(attention_resolutions, str):
        if not attention_resolutions:
            return ()
        resolutions = [int(r) for r in attention_resolutions.split(",")]
    else:
        resolutions = list(attention_resolutions)
    return tuple(image_size // r for r in resolutions)


def create_model(image_size: int,
                 num_channels: int,
                 num_res_blocks: int,
                 in_channels: int = 3,
                 out_channels: Optional[int] = None,
                 channel_mult: Sequence[int] | str = "",
                 num_heads: int = 1,
                 num_head_channels: int = -1,
                 attention_resolutions: str = "16,8",
                 dropout: float = 0.0,
                 class_cond: bool = False,
                 num_classes: Optional[int] = None,
                 use_scale_shift_norm: bool = False,
                 resblock_updown: bool = False,
                 use_checkpoint: bool = False,
                 learn_sigma: bool = False,
                 attention_impl: str = "xla",
                 dtype=jnp.bfloat16,
                 norm_dtype=None,
                 norm_impl: str = "xla",
                 sp_mesh=None,
                 time_scale: float = 1.0) -> UNetModel:
    if not channel_mult:
        if image_size not in _DEFAULT_CHANNEL_MULT:
            raise ValueError(f"unsupported image size: {image_size}")
        channel_mult = _DEFAULT_CHANNEL_MULT[image_size]
    elif isinstance(channel_mult, str):
        channel_mult = tuple(int(c) for c in channel_mult.split(","))
    channel_mult = tuple(channel_mult)

    return UNetModel(
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=out_channels
        or (in_channels if not learn_sigma else 2 * in_channels),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds(image_size,
                                           attention_resolutions),
        dropout=dropout,
        channel_mult=channel_mult,
        num_classes=num_classes if class_cond else None,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_checkpoint=use_checkpoint,
        attention_impl=attention_impl,
        dtype=dtype,
        norm_dtype=norm_dtype,
        norm_impl=norm_impl,
        sp_mesh=sp_mesh,
        time_scale=time_scale,
    )


# ---------------------------------------------------------------------------
# torchcfm-style wrappers (external API surface the CFM scripts rely on)
# ---------------------------------------------------------------------------


def _cfm_backbone(dim: Tuple[int, int, int], num_channels: int,
                  in_channels: int, num_res_blocks: int = 2,
                  channel_mult=None, num_heads: int = 4,
                  attention_resolutions: str = "16", dropout: float = 0.0,
                  num_classes: Optional[int] = None,
                  attention_impl: str = "xla",
                  dtype=jnp.bfloat16, sp_mesh=None) -> UNetModel:
    h, w, c = dim
    return create_model(
        image_size=h, num_channels=num_channels,
        num_res_blocks=num_res_blocks, in_channels=in_channels,
        out_channels=c, channel_mult=channel_mult or "",
        num_heads=num_heads, attention_resolutions=attention_resolutions,
        dropout=dropout, class_cond=num_classes is not None,
        num_classes=num_classes, use_scale_shift_norm=True,
        attention_impl=attention_impl, dtype=dtype, sp_mesh=sp_mesh,
        time_scale=1000.0,  # torchcfm embeds t*1000
    )


class UNetModelWrapper(nn.Module):
    """torchcfm `UNetModelWrapper`: velocity field v(t, x[, y]).

    `dim` is (H, W, C) in our NHWC convention (the reference uses (C, H, W)).
    """

    dim: Tuple[int, int, int]
    num_channels: int = 128
    num_res_blocks: int = 2
    channel_mult: Optional[Tuple[int, ...]] = None
    num_heads: int = 4
    attention_resolutions: str = "16"
    dropout: float = 0.0
    num_classes: Optional[int] = None
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    sp_mesh: object = None  # Mesh -> token-axis ring attention (SURVEY 5.7)

    def setup(self):
        self.net = _cfm_backbone(self.dim, self.num_channels, self.dim[2],
                                 self.num_res_blocks, self.channel_mult,
                                 self.num_heads, self.attention_resolutions,
                                 self.dropout, self.num_classes,
                                 self.attention_impl, self.dtype,
                                 self.sp_mesh)

    def __call__(self, t: Array, x: Array, y: Optional[Array] = None, *,
                 train: bool = False) -> Array:
        return self.net(x, t, y, train=train)


class InPaintModelWrapper(nn.Module):
    """torchcfm `InPaintModelWrapper`: v(t, x, con) with the masked image
    concatenated as extra input channels (mnist/train_mnist.py:193)."""

    dim: Tuple[int, int, int]
    num_channels: int = 32
    num_res_blocks: int = 2
    channel_mult: Optional[Tuple[int, ...]] = None
    num_heads: int = 4
    attention_resolutions: str = "16"
    dropout: float = 0.0
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    sp_mesh: object = None  # Mesh -> token-axis ring attention (SURVEY 5.7)

    def setup(self):
        self.net = _cfm_backbone(self.dim, self.num_channels,
                                 2 * self.dim[2], self.num_res_blocks,
                                 self.channel_mult, self.num_heads,
                                 self.attention_resolutions, self.dropout,
                                 None, self.attention_impl, self.dtype,
                                 self.sp_mesh)

    def __call__(self, t: Array, x: Array, con: Array, *,
                 train: bool = False) -> Array:
        return self.net(jnp.concatenate([x, con], axis=-1), t, train=train)


class SuperResModelWrapper(nn.Module):
    """torchcfm `SuperResModelWrapper`: v(t, x, low_res) — the bilinear
    upsampled low-res image rides along as extra channels
    (mnist/train_mnist_hy.py:231)."""

    dim: Tuple[int, int, int]
    num_channels: int = 128
    num_res_blocks: int = 2
    channel_mult: Optional[Tuple[int, ...]] = None
    num_heads: int = 4
    attention_resolutions: str = "16"
    dropout: float = 0.0
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    sp_mesh: object = None  # Mesh -> token-axis ring attention (SURVEY 5.7)

    def setup(self):
        self.net = _cfm_backbone(self.dim, self.num_channels,
                                 2 * self.dim[2], self.num_res_blocks,
                                 self.channel_mult, self.num_heads,
                                 self.attention_resolutions, self.dropout,
                                 None, self.attention_impl, self.dtype,
                                 self.sp_mesh)

    def __call__(self, t: Array, x: Array, low_res: Array, *,
                 train: bool = False) -> Array:
        h, w = x.shape[1:3]
        if low_res.shape[1:3] != (h, w):
            low_res = jax.image.resize(
                low_res, (low_res.shape[0], h, w, low_res.shape[-1]),
                method="bilinear")
        return self.net(jnp.concatenate([x, low_res], axis=-1), t,
                        train=train)
