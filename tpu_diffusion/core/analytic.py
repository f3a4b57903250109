"""Closed-form Gaussian diffusion conditioning (the h-transform math).

Rebuilds the mathematical content of the reference's
`notebooks/conditioning_with_analytic_htransform.ipynb` (JAX+diffrax there):
for Gaussian data p0 = N(mu0, Sigma0) under the VP-SDE, the marginal,
its score, and the exact conditional score for a linear-Gaussian observation
y = A x0 + noise via Bayes' rule — the analytic ground truth that validates
reconstruction guidance (SURVEY.md §4 calls this the closest thing the
reference has to a correctness test; here it is a library module backing
pytest assertions).

Diagonal covariances only (the notebook's 2-D setting) — enough for exact
tests of every guidance component.
"""

from __future__ import annotations

from typing import Tuple

import jax

from tpu_diffusion.core.schedules import VPSDE

Array = jax.Array


def marginal_params(sde: VPSDE, mu0: Array, var0: Array, t: Array
                    ) -> Tuple[Array, Array]:
    """p_t = N(s(t) mu0, s(t)^2 var0 + sigma(t)^2) for Gaussian p0."""
    s = sde.scale(t)
    sig2 = sde.sigma(t) ** 2
    return s * mu0, s**2 * var0 + sig2


def marginal_score(sde: VPSDE, mu0: Array, var0: Array, x: Array,
                   t: Array) -> Array:
    """grad_x log p_t(x), exact."""
    mean, var = marginal_params(sde, mu0, var0, t)
    return (mean - x) / var


def posterior_x0_given_xt(sde: VPSDE, mu0: Array, var0: Array, xt: Array,
                          t: Array) -> Tuple[Array, Array]:
    """p(x0 | xt) = N(mu_post, var_post), exact for Gaussian p0."""
    s = sde.scale(t)
    sig2 = sde.sigma(t) ** 2
    prec = 1.0 / var0 + s**2 / sig2
    var_post = 1.0 / prec
    mu_post = var_post * (mu0 / var0 + s * xt / sig2)
    return mu_post, var_post


def conditional_score(sde: VPSDE, mu0: Array, var0: Array,
                      y: Array, obs_var: Array, xt: Array,
                      t: Array) -> Array:
    """Exact conditional score grad_x log p_t(x | y) for y = x0 + eps,
    eps ~ N(0, obs_var) — Bayes: condition p0 on y, then diffuse.

    The conditioned data distribution is Gaussian with
      var_c = (1/var0 + 1/obs_var)^-1,
      mu_c  = var_c (mu0/var0 + y/obs_var),
    so the conditional marginal score is the Gaussian score of that p0.
    """
    var_c = 1.0 / (1.0 / var0 + 1.0 / obs_var)
    mu_c = var_c * (mu0 / var0 + y / obs_var)
    return marginal_score(sde, mu_c, var_c, xt, t)


def guidance_term(sde: VPSDE, mu0: Array, var0: Array, y: Array,
                  obs_var: Array, xt: Array, t: Array) -> Array:
    """The h-transform correction: conditional minus unconditional score =
    grad_x log p(y | x_t). Reconstruction guidance approximates exactly
    this term with grad of the likelihood loss at x0_hat(x_t)."""
    return (conditional_score(sde, mu0, var0, y, obs_var, xt, t)
            - marginal_score(sde, mu0, var0, xt, t))
