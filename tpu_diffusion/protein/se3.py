"""R^3 translation diffusion and the combined SE(3) frame diffuser.

Rebuilds `amortised diffusion/src/diffusion/r3_diffuser.py` (VP-SDE over
translations with `coordinate_scaling`, :7-165; `r3framediff_diffuser.py`
is a duplicate) and `se3_diffuser.py:30-271` (SE3Diffuser combining
SO3Diffuser + R3Diffuser over rigid frames). The reference's `Rigid` comes
from a missing openfold vendoring; a minimal rigid type lives here.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_diffusion.protein.so3 import SO3Diffuser, rotvec_to_matrix

Array = jax.Array


class Rigid(NamedTuple):
    """Rigid frames: rotations [..., 3, 3] + translations [..., 3]."""

    rots: Array
    trans: Array

    def compose_rotvec(self, rotvec: Array) -> "Rigid":
        return self._replace(rots=self.rots @ rotvec_to_matrix(rotvec))

    def apply(self, points: Array) -> Array:
        return jnp.einsum("...ij,...j->...i", self.rots, points) \
            + self.trans

    @classmethod
    def identity(cls, shape: Tuple[int, ...]) -> "Rigid":
        return cls(rots=jnp.broadcast_to(jnp.eye(3), shape + (3, 3)),
                   trans=jnp.zeros(shape + (3,)))


class R3Diffuser:
    """VP-SDE over translations in a scaled coordinate system
    (r3_diffuser.py: coordinate_scaling default 0.1)."""

    def __init__(self, min_b: float = 0.1, max_b: float = 20.0,
                 coordinate_scaling: float = 0.1):
        self.min_b = min_b
        self.max_b = max_b
        self.coordinate_scaling = coordinate_scaling

    def _scale(self, x: Array) -> Array:
        return x * self.coordinate_scaling

    def _unscale(self, x: Array) -> Array:
        return x / self.coordinate_scaling

    def b_t(self, t: Array) -> Array:
        return self.min_b + t * (self.max_b - self.min_b)

    def marginal_b_t(self, t: Array) -> Array:
        """int_0^t b(s) ds."""
        return t * self.min_b + t**2 * (self.max_b - self.min_b) / 2

    def forward_marginal(self, key: Array, x0: Array, t: Array
                         ) -> Tuple[Array, Array]:
        """x_t | x_0 and the exact score at the sample."""
        x0s = self._scale(x0)
        ib = self.marginal_b_t(t)[..., None, None]
        mean = jnp.exp(-ib / 2) * x0s
        std = jnp.sqrt(1 - jnp.exp(-ib))
        z = jax.random.normal(key, x0.shape, x0.dtype)
        xt = mean + std * z
        score = -(xt - mean) / jnp.maximum(std**2, 1e-8)
        return self._unscale(xt), score

    def score(self, xt: Array, x0: Array, t: Array) -> Array:
        xts, x0s = self._scale(xt), self._scale(x0)
        ib = self.marginal_b_t(t)[..., None, None]
        mean = jnp.exp(-ib / 2) * x0s
        var = 1 - jnp.exp(-ib)
        return -(xts - mean) / jnp.maximum(var, 1e-8)

    def score_scaling(self, t: Array) -> Array:
        return 1.0 / jnp.sqrt(jnp.maximum(
            1 - jnp.exp(-self.marginal_b_t(t)), 1e-8))

    def reverse_step(self, key: Array, xt: Array, score: Array, t: Array,
                     dt: float, center: bool = True,
                     noise_scale: float = 1.0) -> Array:
        xts = self._scale(xt)
        bt = self.b_t(t)[..., None, None]
        drift = -0.5 * bt * xts - bt * score
        noise = noise_scale * jnp.sqrt(bt * dt) * jax.random.normal(
            key, xt.shape, xt.dtype)
        x = xts - drift * dt + noise
        if center:
            x = x - jnp.mean(x, axis=-2, keepdims=True)
        return self._unscale(x)


class SE3Diffuser:
    """Joint diffusion over rigid frames (se3_diffuser.py:30-271):
    independent SO(3) rotation and R^3 translation processes with optional
    per-component freezing (diffuse_rot / diffuse_trans flags)."""

    def __init__(self, so3: Optional[SO3Diffuser] = None,
                 r3: Optional[R3Diffuser] = None,
                 diffuse_rot: bool = True, diffuse_trans: bool = True):
        self.so3 = so3 or SO3Diffuser()
        self.r3 = r3 or R3Diffuser()
        self.diffuse_rot = diffuse_rot
        self.diffuse_trans = diffuse_trans

    def forward_marginal(self, key: Array, frames: Rigid, t: Array
                         ) -> Tuple[Rigid, Array, Array]:
        """Returns (noised frames, rot score, trans score)."""
        kr, kt = jax.random.split(key)
        if self.diffuse_rot:
            rots_t, rotvec = self.so3.forward_marginal(kr, frames.rots, t)
            rot_score = self.so3.score(t, rotvec)
        else:
            rots_t, rot_score = frames.rots, jnp.zeros_like(frames.trans)
        if self.diffuse_trans:
            trans_t, trans_score = self.r3.forward_marginal(kt,
                                                            frames.trans, t)
        else:
            trans_t = frames.trans
            trans_score = jnp.zeros_like(frames.trans)
        return Rigid(rots_t, trans_t), rot_score, trans_score

    def reverse_step(self, key: Array, frames: Rigid, rot_score: Array,
                     trans_score: Array, t: Array, dt: float) -> Rigid:
        kr, kt = jax.random.split(key)
        rots = frames.rots
        trans = frames.trans
        if self.diffuse_rot:
            rots = self.so3.reverse_step(kr, rots, rot_score, t, dt)
        if self.diffuse_trans:
            trans = self.r3.reverse_step(kt, trans, trans_score, t, dt)
        return Rigid(rots, trans)

    def sample_ref(self, key: Array, shape: Tuple[int, ...]) -> Rigid:
        """Reference (prior) frames: uniform-ish rotations + N(0, I)/scale."""
        kr, kt = jax.random.split(key)
        rv = self.so3.sample(kr, jnp.ones(()), shape)
        trans = jax.random.normal(kt, shape + (3,)) \
            / self.r3.coordinate_scaling
        return Rigid(rotvec_to_matrix(rv), trans)
