"""SDE integration samplers: Euler-Maruyama reverse SDE, probability-flow
ODE, and predictor-corrector.

The reference's Euler-Maruyama loop exists only in notebook copies
(`notebooks/train_image_diffusion.py:69-92`, `image_inpainting.ipynb` —
SURVEY.md §2.5 flags it as worth making first-class) plus an unused
`em_step` inside the amortized sampler (sampling.py:100-111). Here they are
jitted scan loops over the continuous VPSDE:

  * euler_maruyama: dx = [f(x,t) - g^2 score] dt + g dW, integrating t from
    tmax -> tmin, no noise on the last step, NaN-guarded via jnp.nan_to_num
    (the reference prints and breaks; under jit we clamp — pass
    `return_nan_flag=True` to also get a boolean "any step produced NaNs"
    so callers can warn instead of silently scoring a clamped trajectory).
  * probability_flow: dx = [f - g^2/2 score] dt (deterministic).
  * predictor_corrector: EM predictor + Langevin corrector with
    signal-to-noise-scaled step size (Song et al. PC sampler).

`score_fn(x, t)` takes continuous t in [tmin, tmax].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tpu_diffusion.core.schedules import VPSDE, bcast_right

Array = jax.Array
ScoreFn = Callable[[Array, Array], Array]


def _time_grid(sde: VPSDE, num_steps: int) -> Array:
    return jnp.linspace(sde.tmax, sde.tmin, num_steps + 1)


def euler_maruyama(key: Array, score_fn: ScoreFn, sde: VPSDE, xT: Array,
                   num_steps: int = 1000, return_nan_flag: bool = False):
    """Reverse-SDE EM integration (notebooks/train_image_diffusion.py:69-92
    semantics: no noise on the final step). NaNs are zeroed each step to
    keep the scan alive; with `return_nan_flag=True` the second return
    value is True iff any step produced a NaN (the trajectory was clamped
    and should not be trusted silently)."""
    ts = _time_grid(sde, num_steps)

    def body(carry, k):
        x, key, bad = carry
        key, nk = jax.random.split(key)
        t = jnp.full((x.shape[0],), ts[k], x.dtype)
        dt = ts[k] - ts[k + 1]  # positive
        score = score_fn(x, t)
        drift = sde.backward_drift(score, x, t)
        g = bcast_right(sde.diffusion(t), x.ndim)
        noise = jax.random.normal(nk, x.shape, x.dtype)
        last = (k == num_steps - 1).astype(x.dtype)
        x = x - dt * drift + g * jnp.sqrt(dt) * noise * (1.0 - last)
        bad = bad | ~jnp.isfinite(x).all()
        return (jnp.nan_to_num(x), key, bad), None

    (x0, _, bad), _ = jax.lax.scan(
        body, (xT, key, jnp.asarray(False)), jnp.arange(num_steps))
    return (x0, bad) if return_nan_flag else x0


def probability_flow(score_fn: ScoreFn, sde: VPSDE, xT: Array,
                     num_steps: int = 100) -> Array:
    """Deterministic probability-flow ODE (sde_diffusion.py:80-84)."""
    ts = _time_grid(sde, num_steps)

    def body(x, k):
        t = jnp.full((x.shape[0],), ts[k], x.dtype)
        dt = ts[k] - ts[k + 1]
        drift = sde.probability_flow_drift(score_fn(x, t), x, t)
        return x - dt * drift, None

    x0, _ = jax.lax.scan(body, xT, jnp.arange(num_steps))
    return x0


def predictor_corrector(key: Array, score_fn: ScoreFn, sde: VPSDE,
                        xT: Array, num_steps: int = 1000,
                        n_corrector: int = 1, snr: float = 0.16,
                        return_nan_flag: bool = False):
    """EM predictor + Langevin corrector (Song et al. 2021 PC sampler;
    generalizes the reference's fixed-delta corrector_step). NaN handling
    as in `euler_maruyama`."""
    ts = _time_grid(sde, num_steps)

    def corrector(key, x, t):
        def one(k, x):
            ck = jax.random.fold_in(key, k)
            grad = score_fn(x, t)
            noise = jax.random.normal(ck, x.shape, x.dtype)
            gn = jnp.sqrt(jnp.mean(grad**2) + 1e-12)
            nn = 1.0  # E||z||/sqrt(d) for standard normal
            eps = 2.0 * (snr * nn / gn) ** 2
            return x + eps * grad + jnp.sqrt(2.0 * eps) * noise
        return jax.lax.fori_loop(0, n_corrector, one, x)

    def body(carry, k):
        x, key, bad = carry
        key, nk, ck = jax.random.split(key, 3)
        t = jnp.full((x.shape[0],), ts[k], x.dtype)
        dt = ts[k] - ts[k + 1]
        drift = sde.backward_drift(score_fn(x, t), x, t)
        g = bcast_right(sde.diffusion(t), x.ndim)
        noise = jax.random.normal(nk, x.shape, x.dtype)
        last = (k == num_steps - 1).astype(x.dtype)
        x = x - dt * drift + g * jnp.sqrt(dt) * noise * (1.0 - last)
        x = corrector(ck, x, jnp.full((x.shape[0],), ts[k + 1], x.dtype))
        bad = bad | ~jnp.isfinite(x).all()
        return (jnp.nan_to_num(x), key, bad), None

    (x0, _, bad), _ = jax.lax.scan(
        body, (xT, key, jnp.asarray(False)), jnp.arange(num_steps))
    return (x0, bad) if return_nan_flag else x0


def reverse_sde_sampler_from_eps(eps_fn, ddpm) -> ScoreFn:
    """Adapt a discrete eps model into a continuous score for the SDE
    samplers: score(x, t) = -eps(x, i)/sigma_i with i = round(t * Ns)."""
    def score_fn(x, t):
        # round, not truncate: float32 grid times like 0.8999999 must map
        # to index 900, not 899 (a systematic low bias for off-grid t)
        i = jnp.clip(jnp.round(t * ddpm.num_steps).astype(jnp.int32), 0,
                     ddpm.num_steps - 1)
        return ddpm.score_from_noise(eps_fn(x, i), i)
    return score_fn
