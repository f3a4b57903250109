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
from flax import linen as nn

Array = jax.Array


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
    """GroupNorm computed in float32 regardless of the activation dtype
    (reference nn.py:11-13) — fp32 statistics are the fix for the reference's
    DataParallel norm-stats caveat and required for bf16 stability."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig = x.dtype
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        y = nn.GroupNorm(num_groups=groups, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(orig)


def zero_init_conv(features: int, kernel=(3, 3), dtype=None) -> nn.Conv:
    """Conv whose kernel and bias start at zero (reference `zero_module`)."""
    return nn.Conv(features, kernel, padding="SAME",
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros, dtype=dtype)


def nearest_upsample(x: Array, factor: int = 2) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def avg_pool_2x(x: Array) -> Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))
