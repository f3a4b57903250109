"""Noise schedules and the discretized DDPM process.

Reimplements (TPU-native) the numerics of the reference's
`amortised diffusion/image_diffusion/sde_diffusion.py` (VPSDE, DDPM) and
`amortised diffusion/src/diffusion/schedule_discrete.py` /
`schedule_continuous.py` (Linear / Cosine / Quadratic / Sigmoid / Hoogeboom).

Everything is a pure function or a `flax.struct` pytree so it can live inside
`jit` / `lax.scan` / `pjit` without host round trips. Time-indexing uses
`jnp.take` (gather) instead of the reference's `torch.gather` + reshape.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

# ---------------------------------------------------------------------------
# Continuous VP-SDE (reference: image_diffusion/sde_diffusion.py:15-98)
# ---------------------------------------------------------------------------


@struct.dataclass
class VPSDE:
    """Variance-preserving SDE with linear beta(t) = bm + (bd - bm) * t.

    p(x_t | x_0) = N(x_t | scale(t) x_0, sigma(t)^2 I).
    """

    beta_min: float = struct.field(pytree_node=False, default=0.1)
    beta_max: float = struct.field(pytree_node=False, default=20.0)
    tmin: float = struct.field(pytree_node=False, default=1e-4)
    tmax: float = struct.field(pytree_node=False, default=1.0)

    def int_beta(self, t: Array) -> Array:
        """Integral of beta from 0 to t."""
        return self.beta_min * t + (self.beta_max - self.beta_min) * t**2 / 2

    def beta(self, t: Array) -> Array:
        return self.beta_min + (self.beta_max - self.beta_min) * t

    def scale(self, t: Array) -> Array:
        return jnp.exp(-self.int_beta(t) / 2)

    def sigma(self, t: Array) -> Array:
        return jnp.sqrt(1.0 - jnp.exp(-self.int_beta(t)))

    def marginal_prob(self, x0: Array, t: Array) -> Tuple[Array, Array]:
        """Mean and std of p(x_t | x_0), broadcast against x0."""
        s = bcast_right(self.scale(t), x0.ndim)
        sig = bcast_right(self.sigma(t), x0.ndim)
        return s * x0, sig

    def drift(self, x: Array, t: Array) -> Array:
        """dx = drift dt + g dW (forward)."""
        return bcast_right(-0.5 * self.beta(t), x.ndim) * x

    def diffusion(self, t: Array) -> Array:
        return jnp.sqrt(self.beta(t))

    def backward_drift(self, score: Array, x: Array, t: Array) -> Array:
        g2 = bcast_right(self.beta(t), x.ndim)
        return self.drift(x, t) - g2 * score

    def probability_flow_drift(self, score: Array, x: Array, t: Array) -> Array:
        g2 = bcast_right(self.beta(t), x.ndim)
        return self.drift(x, t) - 0.5 * g2 * score

    def noise_score(self, xt: Array, x0: Array, t: Array) -> Array:
        """Score of the Gaussian marginal: grad log p(x_t | x_0)."""
        mean, sig = self.marginal_prob(x0, t)
        return (mean - xt) / sig**2

    def noise_input(self, key: Array, x0: Array, t: Array) -> Tuple[Array, Array]:
        """Sample x_t | x_0; returns (x_t, eps)."""
        mean, sig = self.marginal_prob(x0, t)
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        return mean + sig * eps, eps

    def denoise_input(self, score: Array, xt: Array, t: Array) -> Array:
        s = bcast_right(self.scale(t), xt.ndim)
        sig = bcast_right(self.sigma(t), xt.ndim)
        return (xt + sig**2 * score) / s


def bcast_right(v: Array, ndim: int) -> Array:
    """Broadcast a [B]-shaped (or scalar) value against an ndim-array.

    TPU-native counterpart of the reference's `unsqueeze_like`
    (image_diffusion/sde_diffusion.py:28-46).
    """
    v = jnp.asarray(v)
    if v.ndim == 0:
        return v
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


# ---------------------------------------------------------------------------
# Discrete schedules (reference: src/diffusion/schedule_discrete.py)
# ---------------------------------------------------------------------------


def linear_vpsde_betas(num_steps: int, beta_min: float = 0.1,
                       beta_max: float = 20.0, tmin: float = 1e-5,
                       tmax: float = 1.0) -> np.ndarray:
    """Discretized VP-SDE betas: beta(t_i)/Ns on t_i = linspace(tmin, tmax, Ns).

    Matches the reference DDPM constructor exactly
    (image_diffusion/sde_diffusion.py:127-141) so checkpoints trained either
    side produce identical marginals.

    Schedules are static buffers, so they are built host-side in true
    float64 (JAX x64 is off by default) and embedded as constants.
    """
    ts = np.linspace(tmin, tmax, num_steps, dtype=np.float64)
    return (beta_min + (beta_max - beta_min) * ts) / num_steps


def linear_betas(num_steps: int, beta_start: float = 1e-4,
                 beta_end: float = 0.02) -> np.ndarray:
    """Ho et al. (2020) linear schedule."""
    return np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)


def cosine_alphas_cumprod(num_steps: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule, as cumulative alpha-bar."""
    i = np.arange(num_steps + 1, dtype=np.float64)
    f = np.cos((i / num_steps + s) / (1 + s) * math.pi / 2) ** 2
    return f[1:] / f[0]


def hoogeboom_alphas_cumprod(num_steps: int, s: float = 1e-4,
                             exponent: float = 3.0,
                             clip_value: float = 0.001) -> np.ndarray:
    """Hoogeboom polynomial schedule, discrete form.

    Matches schedule_discrete.py's HoogeboomSchedule exactly: a t-grid of
    `linspace(0, 1, N)` (so abar[0] = 1 - s, not the shifted arange(1..N)/N
    grid), `alpha_bar(t) = (1 - t^exponent)^2 (1-2s) + s` with the
    reference's default exponent 3, then the e3-diffusion
    `clip_noise_schedule`: prepend 1, clip the per-step ratios to
    [clip_value, 1], and re-accumulate. (The protein stack's CONTINUOUS
    Hoogeboom form — exponent 2, no ratio clipping, reference
    sde_diffusion.py:196-205 — lives in protein/sde.py:HoogeboomGraphSDE.)
    """
    t = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    abar = (1.0 - t**exponent) ** 2 * (1 - 2 * s) + s
    abar_ext = np.concatenate([np.ones(1), abar])
    alphas = np.clip(abar_ext[1:] / abar_ext[:-1], clip_value, 1.0)
    return np.cumprod(alphas)


def sigmoid_betas(num_steps: int, beta_start: float = 1e-4,
                  beta_end: float = 0.02, tau: float = 6.0) -> np.ndarray:
    """Sigmoid beta schedule: `sigmoid(linspace(-6, 6, N)) * (be - bs) + bs`
    — schedule_discrete.py's SigmoidBetaSchedule verbatim (raw sigmoid
    values, no endpoint renormalization: betas[0] = bs + 0.0025 (be - bs))."""
    t = np.linspace(-tau, tau, num_steps, dtype=np.float64)
    return beta_start + (beta_end - beta_start) / (1.0 + np.exp(-t))


def quadratic_betas(num_steps: int, beta_start: float = 1e-4,
                    beta_end: float = 0.02) -> np.ndarray:
    return np.linspace(beta_start**0.5, beta_end**0.5, num_steps,
                       dtype=np.float64) ** 2


def betas_from_alphas_cumprod(abar: np.ndarray, max_beta: float = 0.999
                              ) -> np.ndarray:
    abar = np.asarray(abar, np.float64)
    abar_prev = np.concatenate([np.ones((1,), abar.dtype), abar[:-1]])
    return np.clip(1.0 - abar / abar_prev, 0.0, max_beta)


# ---------------------------------------------------------------------------
# DDPM: the discretized process with precomputed posterior coefficients
# (reference: image_diffusion/sde_diffusion.py:107-244)
# ---------------------------------------------------------------------------


@struct.dataclass
class DDPM:
    """Discrete-time DDPM buffers as a jit-compatible pytree.

    Index convention matches the reference: step `i` in [0, Ns), continuous
    time t_i = linspace(tmin, tmax, Ns)[i]; an eps-model trained on discrete
    steps is called with t = i / Ns.
    """

    num_steps: int = struct.field(pytree_node=False)
    tmin: float = struct.field(pytree_node=False)
    tmax: float = struct.field(pytree_node=False)

    ts: Array
    betas: Array
    alphas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array

    # -- constructors ------------------------------------------------------

    @classmethod
    def create(cls, num_steps: int, betas: Array | None = None,
               tmin: float = 1e-5, tmax: float = 1.0,
               dtype=jnp.float32) -> "DDPM":
        """Build from betas (default: discretized VP-SDE, matching reference)."""
        if betas is None:
            betas = linear_vpsde_betas(num_steps, tmin=tmin, tmax=tmax)
        betas = np.asarray(betas, np.float64)
        if not (np.all(betas > 0) and np.all(betas < 1)):
            # validity asserts mirroring src/diffusion/schedule_discrete.py;
            # strictly < 1: beta == 1 makes alpha_cumprod exactly 0 and the
            # 1/abar buffers silently NaN (hit at num_steps == 20, where
            # the scaled-linear schedule's last beta is exactly 1.0)
            raise ValueError(
                f"betas must lie in (0, 1); got range [{betas.min():.4g}, "
                f"{betas.max():.4g}] (the discretized VP-SDE schedule needs "
                f"num_steps > beta_max = 20)")
        ts = np.linspace(tmin, tmax, num_steps, dtype=np.float64)
        alphas = 1.0 - betas
        abar = np.cumprod(alphas)
        abar_prev = np.concatenate([np.ones((1,), abar.dtype), abar[:-1]])
        post_var = betas * (1.0 - abar_prev) / (1.0 - abar)
        f = lambda a: jnp.asarray(a, dtype)
        return cls(
            num_steps=num_steps,
            tmin=tmin,
            tmax=tmax,
            ts=f(ts),
            betas=f(betas),
            alphas=f(alphas),
            alphas_cumprod=f(abar),
            alphas_cumprod_prev=f(abar_prev),
            sqrt_alphas_cumprod=f(np.sqrt(abar)),
            sqrt_one_minus_alphas_cumprod=f(np.sqrt(1.0 - abar)),
            sqrt_recip_alphas_cumprod=f(np.sqrt(1.0 / abar)),
            sqrt_recipm1_alphas_cumprod=f(np.sqrt(1.0 / abar - 1.0)),
            posterior_variance=f(post_var),
            posterior_log_variance_clipped=f(
                np.log(np.clip(post_var, 1e-20, None))),
            posterior_mean_coef1=f(
                betas * np.sqrt(abar_prev) / (1.0 - abar)),
            posterior_mean_coef2=f(
                (1.0 - abar_prev) * np.sqrt(alphas) / (1.0 - abar)),
        )

    @classmethod
    def from_alphas_cumprod(cls, abar, tmin: float = 1e-5,
                            tmax: float = 1.0, dtype=jnp.float32) -> "DDPM":
        return cls.create(len(abar), betas_from_alphas_cumprod(abar),
                          tmin=tmin, tmax=tmax, dtype=dtype)

    # -- indexing ----------------------------------------------------------

    def _gather(self, buf: Array, i: Array, ndim: int) -> Array:
        """buf[i] broadcast to an ndim-array (reference `extract`)."""
        return bcast_right(jnp.take(buf, i, axis=0), ndim)

    def time_of(self, i: Array) -> Array:
        """Continuous time used by the eps-model: t = i / Ns."""
        return i.astype(jnp.float32) / self.num_steps

    # -- forward process ---------------------------------------------------

    def q_sample(self, key: Array, x0: Array, i: Array) -> Tuple[Array, Array]:
        """Sample x_i ~ q(x_i | x_0); returns (x_i, eps)."""
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        xi = (self._gather(self.sqrt_alphas_cumprod, i, x0.ndim) * x0
              + self._gather(self.sqrt_one_minus_alphas_cumprod, i, x0.ndim)
              * eps)
        return xi, eps

    def q_sample_with_noise(self, x0: Array, eps: Array, i: Array) -> Array:
        return (self._gather(self.sqrt_alphas_cumprod, i, x0.ndim) * x0
                + self._gather(self.sqrt_one_minus_alphas_cumprod, i, x0.ndim)
                * eps)

    # -- conversions -------------------------------------------------------

    def predict_start_from_noise(self, xi: Array, i: Array,
                                 eps: Array) -> Array:
        return (self._gather(self.sqrt_recip_alphas_cumprod, i, xi.ndim) * xi
                - self._gather(self.sqrt_recipm1_alphas_cumprod, i, xi.ndim)
                * eps)

    def predict_noise_from_start(self, xi: Array, i: Array,
                                 x0: Array) -> Array:
        return ((self._gather(self.sqrt_recip_alphas_cumprod, i, xi.ndim) * xi
                 - x0)
                / self._gather(self.sqrt_recipm1_alphas_cumprod, i, xi.ndim))

    def score_from_noise(self, eps: Array, i: Array) -> Array:
        """Score = -eps / sigma_i with sigma_i = sqrt(1 - alpha_bar_i)."""
        return -eps / self._gather(self.sqrt_one_minus_alphas_cumprod, i,
                                   eps.ndim)

    def score_from_x0(self, x0: Array, i: Array) -> Array:
        """The corrector's score surrogate (reference `score_from_x0`,
        image_diffusion/sde_diffusion.py:214-218): -x0 / sqrt(1 - abar_i)."""
        return (-self._gather(
            1.0 / self.sqrt_one_minus_alphas_cumprod, i, x0.ndim) * x0)

    # -- reverse process ---------------------------------------------------

    def q_posterior(self, x0: Array, xi: Array,
                    i: Array) -> Tuple[Array, Array, Array]:
        mean = (self._gather(self.posterior_mean_coef1, i, xi.ndim) * x0
                + self._gather(self.posterior_mean_coef2, i, xi.ndim) * xi)
        var = self._gather(self.posterior_variance, i, xi.ndim)
        logvar = self._gather(self.posterior_log_variance_clipped, i, xi.ndim)
        return mean, var, logvar

    def p_mean_variance(self, x0_pred: Array, xi: Array,
                        i: Array) -> Tuple[Array, Array, Array]:
        return self.q_posterior(x0_pred, xi, i)
