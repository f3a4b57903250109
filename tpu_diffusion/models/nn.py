"""Low-level NN building blocks for the diffusion models.

TPU-native counterparts of `amortised diffusion/image_diffusion/nn.py`:
sinusoidal timestep embeddings, fp32 GroupNorm, and zero-initialized output
layers. Gradient checkpointing is `jax.checkpoint` / `nn.remat` at the module
level (no hand-written autograd.Function needed), and EMA lives in
`tpu_diffusion.core.ema` as a pytree transform.

Layout: all image tensors are NHWC.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def effective_platform() -> str:
    """The platform a trace will actually execute on.

    `jax.devices()[0].platform` ignores an enclosing
    `jax.default_device(cpu)` context (used e.g. by the dopri5 CPU
    calibration probe, sampling/ode.py:calibrate_dopri5_steps), so
    impl="auto" dispatch keyed on it would pick a TPU Pallas kernel for a
    CPU trace and fail to lower. Honor the thread-local default device
    first.
    """
    dd = jax.config.jax_default_device
    if dd is not None:
        if isinstance(dd, str):  # jax.default_device("cpu") string form
            return dd
        platform = getattr(dd, "platform", None)
        if platform is not None:
            return platform
    return jax.devices()[0].platform


def timestep_embedding(t: Array, dim: int, max_period: float = 10_000.0
                       ) -> Array:
    """Sinusoidal timestep embeddings (reference nn.py:97-115).

    Args:
      t: [B] float times (any scale — callers pass i/Ns or t in [0,1] scaled
         by the model; the CFM models pass raw t*1000-style values too).
      dim: embedding dimension.
    Returns: [B, dim].
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics (reference nn.py:11-13) — fp32
    statistics are the fix for the reference's DataParallel norm-stats
    caveat and required for bf16 stability.

    `dtype=None` (default) reproduces the reference exactly: the whole
    normalize runs in fp32 and casts back. `dtype=jnp.bfloat16` keeps the
    elementwise normalize/scale in bf16 (halving the HBM traffic of the
    norm) while Flax still computes mean/var in fp32 internally
    (flax promotes the stats dtype to at least float32).
    """

    num_groups: int = 32
    dtype: jnp.dtype | None = None
    # torch.nn.GroupNorm's default (the reference runs on it); flax's own
    # default is 1e-6, which would make norm_impl="xla" and "fused"
    # (FusedNormAct, eps=1e-5) numerically non-interchangeable.
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        if self.dtype is None:
            orig = x.dtype
            y = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                             dtype=jnp.float32,
                             param_dtype=jnp.float32)(x.astype(jnp.float32))
            return y.astype(orig)
        return nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                            dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class FusedNormAct(nn.Module):
    """GroupNorm(+FiLM)+SiLU as ONE Pallas kernel (one HBM read + write).

    Replaces the [GroupNorm32 -> (1+scale)/shift -> SiLU] chains in the
    ResBlocks (reference unet.py:243-351): under XLA those cost ~3 HBM
    round trips per norm (convert+reduce stats pass, normalize pass,
    elementwise pass) and were measured at ~33% of DDIM step time on the
    v5e (PERF.md). Statistics are fp32 on-chip regardless of input dtype —
    the GroupNorm32 contract.

    Params are `scale`/`bias` ([C]), the same names/shapes flax GroupNorm
    uses (but one module level shallower than GroupNorm32's wrapper).
    Falls back to the unfused XLA path when the per-image slab would not
    fit VMEM (256x256 stretch config) or off-TPU.
    """

    num_groups: int = 32
    act: str = "silu"            # "silu" | "none"
    eps: float = 1e-5
    fused: bool = True

    @nn.compact
    def __call__(self, x: Array, film: Array | None = None) -> Array:
        c = x.shape[-1]
        groups = min(self.num_groups, c)
        while c % groups:
            groups -= 1
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        scale = shift = None
        if film is not None:
            scale, shift = jnp.split(film, 2, axis=-1)
        slab_bytes = int(np.prod(x.shape[1:])) * 6  # fp32 in + bf16 out
        # Pallas path needs a TPU (tests force it on CPU via interpret mode
        # + TPU_DIFFUSION_FORCE_FUSED=1).
        import os
        on_tpu = (effective_platform() == "tpu"
                  or os.environ.get("TPU_DIFFUSION_FORCE_FUSED") == "1")
        if self.fused and on_tpu and x.ndim == 4 and slab_bytes < 12_000_000:
            from tpu_diffusion.kernels.groupnorm import fused_groupnorm_silu
            return fused_groupnorm_silu(
                x, gamma, beta,
                None if scale is None else scale.reshape(x.shape[0], -1),
                None if shift is None else shift.reshape(x.shape[0], -1),
                num_groups=groups, eps=self.eps, act=self.act)
        y = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                         dtype=jnp.float32,
                         param_dtype=jnp.float32).apply(
            {"params": {"scale": gamma, "bias": beta}},
            x.astype(jnp.float32))
        if scale is not None:
            while scale.ndim < y.ndim:
                scale = scale[:, None]
                shift = shift[:, None]
            y = y * (1.0 + scale.astype(jnp.float32)) + shift.astype(
                jnp.float32)
        if self.act == "silu":
            y = nn.silu(y)
        return y.astype(x.dtype)


def zero_init_conv(features: int, kernel=(3, 3), dtype=None,
                   name=None) -> nn.Conv:
    """Conv whose kernel and bias start at zero (reference `zero_module`)."""
    return nn.Conv(features, kernel, padding="SAME",
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros, dtype=dtype, name=name)


def nearest_upsample(x: Array, factor: int = 2) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def avg_pool_2x(x: Array) -> Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))
