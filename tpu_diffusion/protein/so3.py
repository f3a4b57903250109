"""IGSO(3) diffusion on rotations.

Rebuilds `amortised diffusion/src/diffusion/{so3_diffuser,igso3}.py`
(FrameDiff-derived; the reference's copy is dormant because its
`data.so3_utils` import is missing — SURVEY.md §2.5 — but the component is
part of the inventory). The isotropic Gaussian on SO(3):

  f(omega | sigma) = sum_l (2l+1) exp(-l(l+1) sigma^2 / 2)
                     sin((l+1/2) omega) / sin(omega / 2)

Grids over (sigma, omega) are precomputed in numpy at construction (the
reference disk-caches them, configs/diffusion/default.yaml:33; in-memory is
simpler and deterministic) and used for inverse-CDF sampling and the score
d/d omega log f. Sampling/scoring are jittable table lookups.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _igso3_expansion(omega: np.ndarray, sigma: np.ndarray,
                     n_l: int = 200) -> np.ndarray:
    """f(omega | sigma): [S, O] truncated series."""
    l = np.arange(n_l)[:, None, None]                      # [L, 1, 1]
    o = omega[None, None, :]                               # [1, 1, O]
    s2 = (sigma**2)[None, :, None]                         # [1, S, 1]
    terms = ((2 * l + 1) * np.exp(-l * (l + 1) * s2 / 2)
             * np.sin((l + 0.5) * o) / np.sin(o / 2))
    return np.clip(terms.sum(0), 1e-12, None)              # [S, O]


class SO3Diffuser:
    """Forward/reverse rotation diffusion with sigma(t) = log-linear spread
    (FrameDiff schedule: sigma(t) = sqrt(log-linear variance))."""

    def __init__(self, min_sigma: float = 0.1, max_sigma: float = 1.5,
                 num_sigma: int = 100, num_omega: int = 500,
                 n_l: int = 200, cache_dir: str | None = None):
        self.min_sigma = min_sigma
        self.max_sigma = max_sigma
        self.num_sigma = num_sigma
        # grids (disk-cached like the reference's
        # configs/diffusion/default.yaml:33 cache_dir)
        self._omega = np.linspace(1e-4, np.pi, num_omega)
        self._sigma_grid = np.linspace(min_sigma, max_sigma, num_sigma)
        pdf = None
        cache_path = None
        if cache_dir is not None:
            import os
            os.makedirs(cache_dir, exist_ok=True)
            cache_path = os.path.join(
                cache_dir,
                f"igso3_{min_sigma}_{max_sigma}_{num_sigma}_"
                f"{num_omega}_{n_l}.npz")
            if os.path.exists(cache_path):
                pdf = np.load(cache_path)["pdf"]
        if pdf is None:
            pdf = _igso3_expansion(self._omega, self._sigma_grid, n_l)
            if cache_path is not None:
                np.savez(cache_path, pdf=pdf)
        # density of omega includes the Haar factor (1-cos omega)/pi
        haar = (1 - np.cos(self._omega)) / np.pi
        self._pdf = pdf * haar[None, :]
        cdf = np.cumsum(self._pdf, axis=1)
        self._cdf = cdf / cdf[:, -1:]
        # score of the angle: d/d omega log f (without the Haar factor —
        # matches the reference's score_norm). Where the truncated series
        # underflows (small sigma, large omega) fall back to the small-sigma
        # Gaussian asymptotic -omega/sigma^2 (FrameDiff's approximation).
        dlogf = np.gradient(np.log(pdf), self._omega, axis=1)
        gauss = -self._omega[None, :] / (self._sigma_grid[:, None] ** 2)
        underflow = pdf <= 1e-11
        self._score_norm = np.where(underflow, gauss, dlogf)
        self._score_scale = np.sqrt(
            np.abs((self._pdf * dlogf**2).sum(1)
                   / self._pdf.sum(1)))  # E[score^2]^0.5 per sigma

        # device copies
        self.omega_grid = jnp.asarray(self._omega)
        self.sigma_grid = jnp.asarray(self._sigma_grid)
        self.cdf = jnp.asarray(self._cdf)
        self.score_norm_table = jnp.asarray(self._score_norm)
        self.score_scale_table = jnp.asarray(self._score_scale)

    # -- schedule -------------------------------------------------------------

    def sigma(self, t: Array) -> Array:
        """FrameDiff's 'logarithmic' schedule (reference
        so3_diffuser.py:188-195): sigma(t) = log(t e^{max} + (1-t) e^{min})
        — monotone from min_sigma to max_sigma, so the linspace sigma grid
        lookup below stays valid."""
        return jnp.log(t * jnp.exp(self.max_sigma)
                       + (1.0 - t) * jnp.exp(self.min_sigma))

    def _sigma_idx(self, sigma: Array) -> Array:
        frac = (sigma - self.min_sigma) / (self.max_sigma - self.min_sigma)
        return jnp.clip((frac * (self.num_sigma - 1)).astype(jnp.int32), 0,
                        self.num_sigma - 1)

    # -- sampling ---------------------------------------------------------------

    def sample_angle(self, key: Array, t: Array, shape: Tuple[int, ...]
                     ) -> Array:
        """Rotation angles omega ~ IGSO3(sigma(t)) by inverse CDF.

        `t` is scalar or [B] (broadcast against a (B, ...) shape)."""
        idx = self._sigma_idx(self.sigma(jnp.asarray(t)))
        idx = jnp.broadcast_to(
            idx.reshape(idx.shape + (1,) * (len(shape) - idx.ndim)), shape)
        u = jax.random.uniform(key, shape)
        rows = self.cdf[idx.reshape(-1)]                    # [K, O]
        pos = jax.vmap(jnp.searchsorted)(rows, u.reshape(-1))
        pos = jnp.clip(pos, 0, len(self._omega) - 1)
        return self.omega_grid[pos].reshape(shape)

    def sample(self, key: Array, t: Array, shape: Tuple[int, ...]) -> Array:
        """Axis-angle rotation vectors [..., 3] from IGSO3(sigma(t))."""
        ka, kv = jax.random.split(key)
        omega = self.sample_angle(ka, t, shape)
        axis = jax.random.normal(kv, shape + (3,))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        return axis * omega[..., None]

    # -- score ---------------------------------------------------------------------

    def score_norm(self, t: Array, omega: Array) -> Array:
        """d/d omega log f(omega | sigma(t)), looked up from the grid.
        `t` scalar or [B], `omega` any shape broadcastable from it."""
        idx = self._sigma_idx(self.sigma(jnp.asarray(t)))
        idx = jnp.broadcast_to(
            idx.reshape(idx.shape + (1,) * (omega.ndim - idx.ndim)),
            omega.shape)
        o_idx = jnp.clip(jnp.searchsorted(self.omega_grid, omega), 0,
                         len(self._omega) - 1)
        return self.score_norm_table[idx, o_idx]

    def score(self, t: Array, rotvec: Array) -> Array:
        """Score in the tangent space: axis * dlogf(|rotvec|)."""
        omega = jnp.linalg.norm(rotvec, axis=-1)
        axis = rotvec / jnp.maximum(omega, 1e-8)[..., None]
        return axis * self.score_norm(t, omega)[..., None]

    def score_scaling(self, t: Array) -> Array:
        """sqrt(E[score^2]) / sqrt(3) — the reference's score_scaling
        semantics verbatim (so3_diffuser.py:172-176, :301-303); FrameDiff
        DIVIDES its rotation loss by this value (it is not a reciprocal)."""
        idx = self._sigma_idx(self.sigma(t))
        return self.score_scale_table[idx] / jnp.sqrt(3.0)

    # -- forward / reverse ------------------------------------------------------------

    def forward_marginal(self, key: Array, rot0: Array, t: Array
                         ) -> Tuple[Array, Array]:
        """Compose rot0 (rotation matrices [..., 3, 3]) with an IGSO3 sample;
        returns (rot_t, sampled rotvec)."""
        rv = self.sample(key, t, rot0.shape[:-2])
        return rot0 @ rotvec_to_matrix(rv), rv

    def reverse_step(self, key: Array, rot_t: Array, score: Array,
                     t: Array, dt: float, noise_scale: float = 1.0
                     ) -> Array:
        """Geodesic EM step: rot <- rot exp{[sigma' related drift] + noise}."""
        # g_t^2 = 2 sigma sigma' for the logarithmic schedule:
        # sigma' = (e^max - e^min) / e^{sigma(t)} (reference
        # so3_diffuser.py:197-206 diffusion_coef squared)
        s = self.sigma(jnp.asarray(t))
        g2 = 2.0 * s * (jnp.exp(self.max_sigma)
                        - jnp.exp(self.min_sigma)) / jnp.exp(s)
        g2 = g2.reshape(g2.shape + (1,) * (score.ndim - g2.ndim))
        drift = g2 * score * dt
        noise = noise_scale * jnp.sqrt(jnp.maximum(g2 * dt, 0.0)) \
            * jax.random.normal(key, score.shape)
        return rot_t @ rotvec_to_matrix(drift + noise)


def rotvec_to_matrix(rv: Array) -> Array:
    """Rodrigues' formula: axis-angle [..., 3] -> rotation [..., 3, 3]."""
    theta = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    k = rv / jnp.maximum(theta, 1e-8)
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    km = jnp.stack([
        jnp.stack([zero, -kz, ky], -1),
        jnp.stack([kz, zero, -kx], -1),
        jnp.stack([-ky, kx, zero], -1)], -2)
    theta = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), km.shape)
    return eye + jnp.sin(theta) * km + (1 - jnp.cos(theta)) * (km @ km)


def matrix_to_rotvec(rot: Array) -> Array:
    """Inverse Rodrigues (log map), stable near 0 and pi."""
    trace = jnp.trace(rot, axis1=-2, axis2=-1)
    cos = jnp.clip((trace - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    theta = jnp.arccos(cos)
    vec = jnp.stack([rot[..., 2, 1] - rot[..., 1, 2],
                     rot[..., 0, 2] - rot[..., 2, 0],
                     rot[..., 1, 0] - rot[..., 0, 1]], -1)
    return vec * (theta / jnp.maximum(2 * jnp.sin(theta), 1e-8))[..., None]
