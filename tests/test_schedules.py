"""Analytic unit tests of schedules and the DDPM process.

Strategy per SURVEY.md §4: validate the discrete buffers against the
continuous VP-SDE closed forms (the math the reference's
`conditioning_with_analytic_htransform.ipynb` checks by hand).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.core import (DDPM, VPSDE, cosine_alphas_cumprod,
                                hoogeboom_alphas_cumprod)


@pytest.fixture(scope="module")
def ddpm():
    return DDPM.create(1000)


def test_betas_match_reference_formula(ddpm):
    # beta_i = (0.1 + 19.9 * t_i) / Ns on t_i = linspace(1e-5, 1, Ns)
    ts = np.linspace(1e-5, 1.0, 1000)
    np.testing.assert_allclose(ddpm.betas, (0.1 + 19.9 * ts) / 1000,
                               rtol=1e-6)


def test_alphas_cumprod_matches_continuous_vpsde(ddpm):
    """Discrete alpha_bar_i should track exp(-int_beta(t_i)) of the SDE."""
    sde = VPSDE()
    cont = np.exp(-np.asarray(sde.int_beta(ddpm.ts)))
    # product of (1 - beta/Ns) vs exp(-integral): agree to O(1/Ns)
    np.testing.assert_allclose(ddpm.alphas_cumprod, cont, atol=5e-3)


def test_posterior_coefficients_sum_identity(ddpm):
    """For x0 == xi == c the posterior mean must be c (coef1+coef2 == 1
    cannot hold exactly, but the affine identity does at i where
    abar==abar_prev*alpha)."""
    c1 = np.asarray(ddpm.posterior_mean_coef1)
    c2 = np.asarray(ddpm.posterior_mean_coef2)
    abar = np.asarray(ddpm.alphas_cumprod)
    abar_prev = np.asarray(ddpm.alphas_cumprod_prev)
    # mean = c1 x0 + c2 xi with x0 = xi/sqrt(abar) (eps=0) must give
    # xi*sqrt(abar_prev*alpha... ) — check the standard identity:
    # c1/sqrt(abar) + c2 == sqrt(alpha_i)*(1-abar_prev)/(1-abar)
    #                      + beta*sqrt(abar_prev)/((1-abar)sqrt(abar))
    lhs = c1 / np.sqrt(abar) + c2
    rhs = 1.0 / np.sqrt(np.asarray(ddpm.alphas))
    # posterior mean of a clean chain: E[x_{i-1}|x_i, x0=x_i/sqrt(abar)]
    # equals x_i/sqrt(alpha_i)*[beta*abar_prev... ] -> reduces to
    # sqrt(abar_prev)/sqrt(abar)*[...]; check against direct formula:
    direct = (np.asarray(ddpm.betas) * np.sqrt(abar_prev) / (1 - abar)
              / np.sqrt(abar)
              + (1 - abar_prev) * np.sqrt(np.asarray(ddpm.alphas))
              / (1 - abar))
    np.testing.assert_allclose(lhs, direct, rtol=1e-4)
    del rhs


def test_q_sample_marginal_statistics(ddpm):
    """Empirical mean/std of q(x_i | x0) match the closed form."""
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4096, 2))
    i = jnp.full((4096,), 500, jnp.int32)
    xi, eps = ddpm.q_sample(key, x0, i)
    want_mean = ddpm.sqrt_alphas_cumprod[500]
    want_std = ddpm.sqrt_one_minus_alphas_cumprod[500]
    assert abs(xi.mean() - want_mean) < 0.05
    assert abs(xi.std() - want_std) < 0.05
    assert abs(eps.std() - 1.0) < 0.05


def test_predict_start_roundtrip(ddpm):
    """x0 -> q_sample -> predict_start_from_noise recovers x0 exactly."""
    key = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(key, (8, 5, 5, 3), minval=-1, maxval=1)
    i = jnp.arange(8) * 100
    xi, eps = ddpm.q_sample(jax.random.PRNGKey(2), x0, i)
    rec = ddpm.predict_start_from_noise(xi, i, eps)
    np.testing.assert_allclose(rec, x0, atol=1e-3)
    eps_rec = ddpm.predict_noise_from_start(xi, i, x0)
    np.testing.assert_allclose(eps_rec, eps, atol=2e-2)


def test_posterior_variance_nonnegative_and_clipped_log(ddpm):
    assert np.all(np.asarray(ddpm.posterior_variance) >= 0)
    assert np.all(np.isfinite(np.asarray(
        ddpm.posterior_log_variance_clipped)))


def test_vpsde_scale_sigma_identity():
    """scale^2 + sigma^2 == 1 (variance preserving)."""
    sde = VPSDE()
    t = jnp.linspace(1e-4, 1.0, 64)
    np.testing.assert_allclose(sde.scale(t) ** 2 + sde.sigma(t) ** 2,
                               np.ones(64), atol=1e-6)


def test_vpsde_noise_score_is_gaussian_score():
    """noise_score == grad_x log N(x | s x0, sigma^2) checked by autodiff."""
    sde = VPSDE()
    x0 = jnp.array([0.7])
    t = jnp.array(0.3)
    xt = jnp.array([0.1])

    def logp(x):
        s, sig = sde.scale(t), sde.sigma(t)
        return -0.5 * jnp.sum((x - s * x0) ** 2) / sig**2

    want = jax.grad(logp)(xt)
    got = sde.noise_score(xt[None], x0[None], t[None])[0]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_denoise_input_inverts_noise_input():
    """With the exact score, denoise_input returns x0."""
    sde = VPSDE()
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (16, 4))
    t = jnp.full((16,), 0.5)
    xt, _ = sde.noise_input(jax.random.PRNGKey(4), x0, t)
    score = sde.noise_score(xt, x0, t)
    np.testing.assert_allclose(sde.denoise_input(score, xt, t), x0,
                               atol=1e-4)


def test_hoogeboom_schedule_shape():
    abar = np.asarray(hoogeboom_alphas_cumprod(250))
    assert abar[0] > 0.99
    assert abar[-1] == pytest.approx(1e-4, rel=0.1)
    assert np.all(np.diff(abar) < 0)  # monotone decreasing


def test_cosine_schedule_valid():
    abar = np.asarray(cosine_alphas_cumprod(1000))
    assert np.all(abar > 0) and np.all(abar <= 1)
    assert np.all(np.diff(abar) < 0)


def test_ddpm_from_alphas_cumprod_roundtrip():
    abar = cosine_alphas_cumprod(100)
    d = DDPM.from_alphas_cumprod(abar)
    np.testing.assert_allclose(d.alphas_cumprod, abar, rtol=1e-4, atol=1e-6)


def test_score_from_noise(ddpm):
    eps = jnp.ones((2, 3))
    i = jnp.array([100, 900])
    got = ddpm.score_from_noise(eps, i)
    want = -1.0 / np.asarray(
        ddpm.sqrt_one_minus_alphas_cumprod)[np.array([100, 900])]
    np.testing.assert_allclose(got[:, 0], want, rtol=1e-5)
