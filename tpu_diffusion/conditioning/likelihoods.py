"""Forward operators ("likelihoods") for conditional generation.

Rebuilds `amortised diffusion/image_diffusion/likelihoods.py` as batched pure
functions: the reference samples one random patch per image in a Python loop
(`Likelihood.sample`, likelihoods.py:22-27); here patch positions are drawn
for the whole batch with one key and applied with broadcasted index masks, so
condition synthesis fuses into the jitted train step.

Layout: NHWC. `loss` is per-sample (shape [B]) — it is the scalar the
reconstruction-guidance sampler differentiates through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class Likelihood:
    def sample(self, key: Array, x: Array) -> Array:
        raise NotImplementedError

    def none_like(self, x: Array) -> Array:
        raise NotImplementedError

    def loss(self, x: Array, condition: Array) -> Array:
        raise NotImplementedError


def _patch_mask(key: Array, batch: int, image_size: int, patch_size: int,
                margin: int = 5, image_width: int | None = None) -> Array:
    """[B, H, W, 1] boolean mask, True inside a random patch per image.

    Patch origin ~ U[margin, size - patch_size - margin) per axis, matching
    the reference's border rule (likelihoods.py:49-53). `image_size` is the
    height; `image_width` defaults to it (square images) but non-square
    NHWC inputs get their own width bounds and mask axis.
    """
    w_size = image_size if image_width is None else image_width

    def axis_origin(k, size):
        lo, hi = margin, size - patch_size - margin
        if patch_size + 2 * margin > size:
            raise ValueError(
                f"patch_size={patch_size} with margin={margin} does not fit "
                f"in a {size}-pixel axis (need patch_size <= "
                f"{size - 2 * margin})")
        return jax.random.randint(k, (batch,), lo, max(hi, lo + 1))

    kh, kw = jax.random.split(key)
    h0 = axis_origin(kh, image_size)
    w0 = axis_origin(kw, w_size)
    rows = jnp.arange(image_size)
    cols = jnp.arange(w_size)
    in_h = (rows[None, :] >= h0[:, None]) & (
        rows[None, :] < h0[:, None] + patch_size)      # [B, H]
    in_w = (cols[None, :] >= w0[:, None]) & (
        cols[None, :] < w0[:, None] + patch_size)      # [B, W]
    return (in_h[:, :, None] & in_w[:, None, :])[..., None]


@struct.dataclass
class Painting(Likelihood):
    patch_size: int = struct.field(pytree_node=False, default=20)
    pad_value: float = -2.0

    @classmethod
    def from_configdict(cls, config):
        return cls(patch_size=config["patch_size"],
                   pad_value=config["pad_value"])

    def none_like(self, x: Array) -> Array:
        return jnp.full_like(x, self.pad_value)

    def loss(self, x: Array, condition: Array) -> Array:
        """Masked SSE over observed pixels, per sample
        (likelihoods.py:58-66)."""
        observed = condition != self.pad_value
        diff = jnp.where(observed, x - condition, 0.0)
        return jnp.sum(diff**2, axis=tuple(range(1, x.ndim)))

    def observed_mask(self, condition: Array) -> Array:
        return condition != self.pad_value


@struct.dataclass
class InPainting(Painting):
    """Condition = image with a random patch blanked to pad_value."""

    def sample(self, key: Array, x: Array) -> Array:
        mask = _patch_mask(key, x.shape[0], x.shape[1], self.patch_size,
                           image_width=x.shape[2])
        return jnp.where(mask, self.pad_value, x)


@struct.dataclass
class OutPainting(Painting):
    """Condition = only a random patch kept; everything else pad_value."""

    def sample(self, key: Array, x: Array) -> Array:
        mask = _patch_mask(key, x.shape[0], x.shape[1], self.patch_size,
                           image_width=x.shape[2])
        return jnp.where(mask, x, self.pad_value)


@struct.dataclass
class HyperResolution(Likelihood):
    """Super-resolution operator: bilinear down to (th, tw), back up
    (likelihoods.py:107-139). `none_like` is zeros, and the guidance loss is
    the mean MSE against the re-upscaled condition."""

    target_height: int = struct.field(pytree_node=False, default=16)
    target_width: int = struct.field(pytree_node=False, default=16)

    @classmethod
    def from_configdict(cls, config):
        return cls(target_height=config["target_height"],
                   target_width=config["target_width"])

    def downsample(self, x: Array) -> Array:
        b, _, _, c = x.shape
        return jax.image.resize(
            x, (b, self.target_height, self.target_width, c),
            method="bilinear")

    def sample(self, key: Array, x: Array) -> Array:
        del key  # deterministic operator
        b, h, w, c = x.shape
        return jax.image.resize(self.downsample(x), (b, h, w, c),
                                method="bilinear")

    def none_like(self, x: Array) -> Array:
        return jnp.zeros_like(x)

    def loss(self, x: Array, condition: Array) -> Array:
        b, h, w, _ = x.shape
        if condition.shape[1:3] != (h, w):
            condition = jax.image.resize(
                condition, (b, h, w, condition.shape[-1]), method="bilinear")
        return jnp.mean((condition - x) ** 2,
                        axis=tuple(range(1, x.ndim)))


LIKELIHOODS = {
    "inpainting": InPainting,
    "outpainting": OutPainting,
    "hyperresolution": HyperResolution,
}


def get_likelihood(name: str):
    """Factory (reference likelihoods.py:150-158)."""
    key = name.lower()
    if key not in LIKELIHOODS:
        raise NotImplementedError(f"Unknown likelihood {name!r}")
    return LIKELIHOODS[key]
