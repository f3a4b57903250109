"""Analytic h-transform checks (the reference notebook's validations as
asserted tests): exact scores by autodiff, guidance-term consistency, and
reconstruction guidance recovering the exact conditional score in the
Gaussian setting."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.core.analytic import (conditional_score, guidance_term,
                                         marginal_params, marginal_score,
                                         posterior_x0_given_xt)
from tpu_diffusion.core.schedules import VPSDE

SDE = VPSDE()
MU0, VAR0 = jnp.asarray(0.7), jnp.asarray(0.3)


def test_marginal_score_matches_autodiff():
    t = jnp.asarray(0.4)
    x = jnp.asarray(0.2)

    def logp(x):
        mean, var = marginal_params(SDE, MU0, VAR0, t)
        return -0.5 * (x - mean) ** 2 / var

    np.testing.assert_allclose(marginal_score(SDE, MU0, VAR0, x, t),
                               jax.grad(logp)(x), rtol=1e-5)


def test_marginal_variance_preserved_at_t1():
    """At t=1 the marginal is ~N(0,1) regardless of p0."""
    mean, var = marginal_params(SDE, MU0, VAR0, jnp.asarray(1.0))
    assert abs(float(mean)) < 0.01  # scale(1) = exp(-10.05/2) ~ 0.0066
    assert abs(float(var) - 1.0) < 1e-2


def test_posterior_x0_given_xt_limits():
    """t->0: posterior concentrates on xt; t->1: reverts to the prior."""
    xt = jnp.asarray(0.1)
    mu_s, var_s = posterior_x0_given_xt(SDE, MU0, VAR0, xt,
                                        jnp.asarray(1e-4))
    assert abs(float(mu_s) - 0.1) < 1e-2
    assert float(var_s) < 1e-3
    mu_l, var_l = posterior_x0_given_xt(SDE, MU0, VAR0, xt,
                                        jnp.asarray(1.0))
    assert abs(float(mu_l) - float(MU0)) < 0.05
    assert abs(float(var_l) - float(VAR0)) < 0.05


def test_conditional_score_sharp_observation():
    """With a near-exact observation, the conditional marginal centers on
    the diffused observation."""
    y = jnp.asarray(-0.5)
    t = jnp.asarray(0.3)
    xt = jnp.asarray(0.0)
    score = conditional_score(SDE, MU0, VAR0, y, jnp.asarray(1e-6), xt, t)
    # conditional p0 ~ delta(y): score = (s*y - x)/sigma^2
    s, sig = SDE.scale(t), SDE.sigma(t)
    want = (s * y - xt) / sig**2
    np.testing.assert_allclose(score, want, rtol=1e-3)


def test_guidance_term_is_difference_of_scores():
    y, obs_var = jnp.asarray(0.2), jnp.asarray(0.05)
    t, xt = jnp.asarray(0.5), jnp.asarray(-0.1)
    g = guidance_term(SDE, MU0, VAR0, y, obs_var, xt, t)
    diff = (conditional_score(SDE, MU0, VAR0, y, obs_var, xt, t)
            - marginal_score(SDE, MU0, VAR0, xt, t))
    np.testing.assert_allclose(g, diff, rtol=1e-6)


def test_reconstruction_guidance_matches_htransform():
    """grad_x log E[p(y|x0)|xt] computed through the exact posterior mean
    (what reconstruction guidance approximates) vs the exact guidance term
    — equal in the Gaussian case when the full posterior variance is used."""
    y, obs_var = jnp.asarray(0.4), jnp.asarray(0.1)
    t = jnp.asarray(0.6)
    xt = jnp.asarray(0.3)

    def log_lik(xt_):
        mu_post, var_post = posterior_x0_given_xt(SDE, MU0, VAR0, xt_, t)
        # p(y | xt) = N(y | mu_post, var_post + obs_var)
        v = var_post + obs_var
        return -0.5 * (y - mu_post) ** 2 / v - 0.5 * jnp.log(v)

    got = jax.grad(log_lik)(xt)
    want = guidance_term(SDE, MU0, VAR0, y, obs_var, xt, t)
    np.testing.assert_allclose(got, want, rtol=1e-4)
