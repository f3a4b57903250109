"""Tests of likelihood operators and the conditional samplers.

Uses an analytically tractable "model" (the exact score of a known Gaussian
mixture / exact eps for a known x0) so the sampler math is verified without
training — the approach of the reference's
`conditioning_with_analytic_htransform.ipynb` (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.conditioning.guidance import (Amortized,
                                                 ReconstructionGuidance,
                                                 Replacement,
                                                 get_conditioning)
from tpu_diffusion.conditioning.likelihoods import (HyperResolution,
                                                    InPainting, OutPainting,
                                                    get_likelihood)
from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.losses.ddpm import amortized_ddpm_loss, ddpm_loss
from tpu_diffusion.sampling.ancestral import (make_conditional_sampler,
                                              make_ddim_sampler,
                                              make_prior_sampler)

B, H, W, C = 4, 16, 16, 1


@pytest.fixture(scope="module")
def ddpm():
    return DDPM.create(100)


def _images(key):
    return jnp.tanh(jax.random.normal(key, (B, H, W, C)))


# --- likelihoods -----------------------------------------------------------


def test_inpainting_masks_one_patch_per_image():
    lik = InPainting(patch_size=4, pad_value=-2.0)
    x = _images(jax.random.PRNGKey(0))
    cond = lik.sample(jax.random.PRNGKey(1), x)
    masked = np.asarray(cond == -2.0).reshape(B, -1).sum(-1)
    np.testing.assert_array_equal(masked, 16 * np.ones(B))
    # observed pixels untouched
    obs = np.asarray(cond != -2.0)
    np.testing.assert_allclose(np.asarray(cond)[obs], np.asarray(x)[obs])


def test_inpainting_respects_border_margin():
    lik = InPainting(patch_size=4, pad_value=-2.0)
    x = _images(jax.random.PRNGKey(2))
    for seed in range(5):
        cond = np.asarray(lik.sample(jax.random.PRNGKey(seed), x))
        border = np.concatenate([
            cond[:, :5].ravel(), cond[:, -5:].ravel(),
            cond[:, :, :5].ravel(), cond[:, :, -5:].ravel()])
        assert not np.any(border == -2.0)


def test_outpainting_keeps_one_patch():
    lik = OutPainting(patch_size=4, pad_value=-2.0)
    x = _images(jax.random.PRNGKey(3))
    cond = np.asarray(lik.sample(jax.random.PRNGKey(4), x))
    kept = (cond != -2.0).reshape(B, -1).sum(-1)
    np.testing.assert_array_equal(kept, 16 * np.ones(B))


def test_painting_loss_only_on_observed():
    lik = InPainting(patch_size=4, pad_value=-2.0)
    x = _images(jax.random.PRNGKey(5))
    cond = lik.sample(jax.random.PRNGKey(6), x)
    # perfect reconstruction -> zero loss
    np.testing.assert_allclose(lik.loss(x, cond), 0.0, atol=1e-9)
    # perturbing masked pixels does not change the loss
    x2 = jnp.where(cond == -2.0, x + 100.0, x)
    np.testing.assert_allclose(lik.loss(x2, cond), 0.0, atol=1e-9)
    # perturbing observed pixels does
    x3 = x + 1.0
    assert float(lik.loss(x3, cond).sum()) > 0


def test_hyperresolution_roundtrip_shapes():
    lik = HyperResolution(target_height=4, target_width=4)
    x = _images(jax.random.PRNGKey(7))
    cond = lik.sample(jax.random.PRNGKey(8), x)
    assert cond.shape == x.shape
    # constant image survives down/up exactly
    const = jnp.full((B, H, W, C), 0.37)
    np.testing.assert_allclose(lik.sample(None, const), const, atol=1e-6)
    assert float(jnp.max(lik.loss(const, lik.downsample(const)))) < 1e-10


def test_factories():
    assert get_likelihood("inpainting") is InPainting
    assert get_likelihood("HyperResolution") is HyperResolution
    assert get_conditioning("amortized") is Amortized
    with pytest.raises(NotImplementedError):
        get_likelihood("xyz")


# --- losses ----------------------------------------------------------------


def test_ddpm_loss_near_one_for_zero_model(ddpm):
    """E||eps - 0||^2 == 1 for a zero network."""
    def net(x, t):
        return jnp.zeros_like(x)

    vals = [float(ddpm_loss(jax.random.PRNGKey(s), net, ddpm,
                            _images(jax.random.PRNGKey(s + 100))))
            for s in range(8)]
    assert abs(np.mean(vals) - 1.0) < 0.1


def test_amortized_loss_concat_channels(ddpm):
    """The amortized loss feeds 2C channels to the network."""
    lik = InPainting(patch_size=4, pad_value=-2.0)
    cond_cfg = Amortized(p_cond=1.0)
    seen = {}

    def net(x, t):
        seen["channels"] = x.shape[-1]
        return jnp.zeros(x.shape[:-1] + (C,))

    amortized_ddpm_loss(jax.random.PRNGKey(0), net, ddpm, cond_cfg, lik,
                        _images(jax.random.PRNGKey(1)))
    assert seen["channels"] == 2 * C


# --- samplers with an exact model -----------------------------------------


def _exact_eps_fn(ddpm, x_target):
    """eps that pulls every sample toward a fixed x_target: the exact
    eps-prediction when the data distribution is the delta at x_target."""
    def eps_fn(xi, i):
        return ddpm.predict_noise_from_start(xi, i, jnp.broadcast_to(
            x_target, xi.shape))
    return eps_fn


def test_prior_sampler_recovers_delta_target(ddpm):
    """With the exact eps model of a point mass, ancestral sampling must
    land on the point."""
    target = jnp.full((H, W, C), 0.5)
    sampler = make_prior_sampler(_exact_eps_fn(ddpm, target), ddpm)
    xT = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    x0 = jax.jit(sampler)(jax.random.PRNGKey(1), xT)
    np.testing.assert_allclose(np.asarray(x0), 0.5, atol=0.05)


def test_ddim_sampler_recovers_delta_target(ddpm):
    target = jnp.full((H, W, C), -0.25)
    sampler = make_ddim_sampler(_exact_eps_fn(ddpm, target), ddpm,
                                num_steps=20)
    xT = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C))
    x0 = jax.jit(sampler)(jax.random.PRNGKey(3), xT)
    np.testing.assert_allclose(np.asarray(x0), -0.25, atol=0.03)


def test_cached_ddim_reuse1_exact_and_reuse2_close(ddpm):
    """Encoder-reuse DDIM (arXiv:2312.09608): reuse=1 is bitwise the plain
    sampler; reuse=2 skips half the encoder passes and stays close."""
    from tpu_diffusion.models.unet import UNetModel
    from tpu_diffusion.sampling.ancestral import make_cached_ddim_sampler

    model = UNetModel(in_channels=C, model_channels=8, out_channels=C,
                      num_res_blocks=1, channel_mult=(1, 2),
                      attention_resolutions=(2,), num_heads=2,
                      dtype=jnp.float32)
    x0s = jnp.zeros((1, H, W, C))
    params = model.init(jax.random.PRNGKey(0), x0s, jnp.zeros((1,)))
    # perturb the zero-init output head so eps-hat is non-trivial
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(str(path)) % (2**31)), p.shape)
        if "conv_out" in str(path) else p, params)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32)
                           / ddpm.num_steps)

    def encode_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32)
                           / ddpm.num_steps, mode="encode")

    def decode_fn(xi, i, cache):
        return model.apply(params, xi, i.astype(jnp.float32)
                           / ddpm.num_steps, mode="decode", cache=cache)

    xT = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C))
    plain = make_ddim_sampler(eps_fn, ddpm, num_steps=20)(
        jax.random.PRNGKey(3), xT)
    cached1 = make_cached_ddim_sampler(encode_fn, decode_fn, ddpm,
                                       num_steps=20, encoder_reuse=1)(
        jax.random.PRNGKey(3), xT)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(cached1),
                               atol=1e-6, rtol=1e-6)
    cached2 = make_cached_ddim_sampler(encode_fn, decode_fn, ddpm,
                                       num_steps=20, encoder_reuse=2)(
        jax.random.PRNGKey(3), xT)
    assert np.all(np.isfinite(np.asarray(cached2)))
    # adjacent-step encoder features are similar -> outputs stay close
    assert float(jnp.mean(jnp.abs(cached2 - plain))) < 0.05


def test_cached_amortized_reuse1_bitwise_exact(ddpm):
    """make_cached_amortized_sampler(encoder_reuse=1) reproduces the plain
    amortized ancestral sampler bit for bit (same PRNG stream)."""
    from tpu_diffusion.models.unet import UNetModel
    from tpu_diffusion.sampling.ancestral import (
        make_cached_amortized_sampler)

    lik = InPainting(patch_size=4, pad_value=-2.0)
    # n_corrector=0: with correctors the cached sampler decodes corrector
    # iterates from the step's cache (by design), which differs from the
    # plain sampler's per-iterate encoder recompute.
    cond = Amortized(n_corrector=0, delta=0.1)
    model = UNetModel(in_channels=2 * C, model_channels=8, out_channels=C,
                      num_res_blocks=1, channel_mult=(1, 2),
                      attention_resolutions=(), dtype=jnp.float32)
    x0s = jnp.zeros((1, H, W, 2 * C))
    params = model.init(jax.random.PRNGKey(0), x0s, jnp.zeros((1,)))
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(str(path)) % (2**31)), p.shape)
        if "conv_out" in str(path) else p, params)

    def eps_fn(xi, i):
        return model.apply(params, xi,
                           i.astype(jnp.float32) / ddpm.num_steps)

    def encode_fn(xi, i):
        return model.apply(params, xi,
                           i.astype(jnp.float32) / ddpm.num_steps,
                           mode="encode")

    def decode_fn(xi, i, cache):
        return model.apply(params, xi,
                           i.astype(jnp.float32) / ddpm.num_steps,
                           mode="decode", cache=cache)

    truth = _images(jax.random.PRNGKey(4))
    condition = lik.sample(jax.random.PRNGKey(5), truth)
    xT = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, C))
    plain = make_conditional_sampler(eps_fn, ddpm, cond, lik)(
        jax.random.PRNGKey(7), xT, condition)
    cached = make_cached_amortized_sampler(
        encode_fn, decode_fn, ddpm, cond, lik, encoder_reuse=1)(
        jax.random.PRNGKey(7), xT, condition)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(cached),
                               atol=1e-6, rtol=1e-6)
    cond_c = Amortized(n_corrector=1, delta=0.1)
    cached2 = make_cached_amortized_sampler(
        encode_fn, decode_fn, ddpm, cond_c, lik, encoder_reuse=4)(
        jax.random.PRNGKey(7), xT, condition)
    assert np.all(np.isfinite(np.asarray(cached2)))


def test_cached_ddim_indivisible_reuse_matches_k1(ddpm):
    """A non-dividing encoder_reuse runs the remainder as a shorter first
    group (prologue) — 20 steps at K=3 is groups of [2, 3, 3, 3, 3, 3, 3].
    With a cache-IGNORING decode, the grouping must not change the math:
    every K must reproduce K=1 (up to compilation-variant rounding — the
    prologue changes fusion boundaries), which pins the prologue's step
    order and coefficient routing exactly."""
    from tpu_diffusion.sampling.ancestral import make_cached_ddim_sampler

    abar = ddpm.alphas_cumprod

    def encode_fn(xi, i):
        return ()

    def decode_fn(xi, i, cache):  # exact eps for x0 = 0; ignores cache
        s = jnp.sqrt(1.0 - abar[i]).reshape((-1,) + (1,) * (xi.ndim - 1))
        return xi / jnp.maximum(s, 1e-6)

    xT = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C))
    ref = make_cached_ddim_sampler(encode_fn, decode_fn, ddpm,
                                   num_steps=20, encoder_reuse=1)(
        jax.random.PRNGKey(3), xT)
    for reuse in (3, 7, 64):  # 64 > num_steps=20: single-prologue chain
        x0 = make_cached_ddim_sampler(encode_fn, decode_fn, ddpm,
                                      num_steps=20, encoder_reuse=reuse)(
            jax.random.PRNGKey(3), xT)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        make_cached_ddim_sampler(encode_fn, decode_fn, ddpm,
                                 num_steps=10, encoder_reuse=0)


def test_cached_amortized_indivisible_reuse_matches_k1(ddpm):
    """make_cached_amortized_sampler at K=3 (100 % 3 = 1 prologue step):
    with a cache-ignoring decode the PRNG stream and update math are
    identical to K=1, so the outputs must match up to compilation-variant
    rounding — the stochastic twin of the DDIM prologue pin above."""
    from tpu_diffusion.sampling.ancestral import (
        make_cached_amortized_sampler)

    lik = InPainting(patch_size=4, pad_value=-2.0)
    cond = Amortized(n_corrector=1, delta=0.1)
    abar = ddpm.alphas_cumprod

    def encode_fn(x_cat, i):
        return ()

    def decode_fn(x_cat, i, cache):
        xi = x_cat[..., :C]
        s = jnp.sqrt(1.0 - abar[i]).reshape((-1,) + (1,) * (xi.ndim - 1))
        return xi / jnp.maximum(s, 1e-6)

    truth = _images(jax.random.PRNGKey(4))
    condition = lik.sample(jax.random.PRNGKey(5), truth)
    xT = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, C))
    ref = make_cached_amortized_sampler(
        encode_fn, decode_fn, ddpm, cond, lik, encoder_reuse=1)(
        jax.random.PRNGKey(7), xT, condition)
    for reuse in (3, 7):
        x0 = make_cached_amortized_sampler(
            encode_fn, decode_fn, ddpm, cond, lik, encoder_reuse=reuse)(
            jax.random.PRNGKey(7), xT, condition)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_replacement_sampler_pins_observed_pixels(ddpm):
    lik = InPainting(patch_size=4, pad_value=-2.0)
    truth = _images(jax.random.PRNGKey(4))
    cond = lik.sample(jax.random.PRNGKey(5), truth)

    def identity_x0_eps_fn(xi, i):
        # model whose x0-prediction is clip(xi): propagates the replaced
        # observed pixels through the posterior step
        return ddpm.predict_noise_from_start(xi, i, jnp.clip(xi, -1, 1))

    sampler = make_conditional_sampler(
        identity_x0_eps_fn, ddpm,
        Replacement(noise=False, n_corrector=0), lik)
    xT = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, C))
    x0 = jax.jit(sampler)(jax.random.PRNGKey(7), xT, cond)
    obs = np.asarray(lik.observed_mask(cond))
    # one reverse step after the last replacement perturbs observed pixels
    # by at most the final posterior stddev — loose tolerance
    err = np.abs(np.asarray(x0) - np.asarray(cond))[obs]
    assert err.mean() < 0.1


def test_guidance_sampler_moves_toward_condition(ddpm):
    """Reconstruction guidance on a flat prior (eps-model of N(0, I) data)
    pulls samples toward the observed pixels."""
    lik = InPainting(patch_size=6, pad_value=-2.0)
    truth = jnp.clip(_images(jax.random.PRNGKey(8)) * 0 + 0.8, -1, 1)
    cond = lik.sample(jax.random.PRNGKey(9), truth)

    def eps_fn(xi, i):
        # x0-model = 0.9 * xi: differentiable in xi so guidance gradients
        # flow (a constant x0-model would have zero guidance gradient)
        return ddpm.predict_noise_from_start(xi, i, 0.9 * xi)

    guided = make_conditional_sampler(
        eps_fn, ddpm, ReconstructionGuidance(gamma=20.0, n_corrector=0),
        lik)
    plain = make_prior_sampler(eps_fn, ddpm)
    xT = jax.random.normal(jax.random.PRNGKey(10), (B, H, W, C))
    xg = jax.jit(guided)(jax.random.PRNGKey(11), xT, cond)
    xp = jax.jit(plain)(jax.random.PRNGKey(11), xT)
    obs = np.asarray(lik.observed_mask(cond))
    err_guided = float(np.mean(np.abs(np.asarray(xg) - 0.8)[obs]))
    err_plain = float(np.mean(np.abs(np.asarray(xp) - 0.8)[obs]))
    assert err_guided < err_plain


def test_guidance_two_scan_split_bitwise(ddpm):
    """The plain/guided scan split (no grad on the inactive prefix) must be
    bitwise-identical to the single masked scan it replaced — same PRNG
    stream, x_update exactly zero while i >= start_step."""
    from tpu_diffusion.sampling.ancestral import (_batched, _corrector_steps,
                                                  _posterior_step,
                                                  _reverse_scan,
                                                  make_x0_model)

    lik = InPainting(patch_size=6, pad_value=-2.0)
    truth = jnp.clip(_images(jax.random.PRNGKey(8)) * 0 + 0.8, -1, 1)
    cond_img = lik.sample(jax.random.PRNGKey(9), truth)
    g = ReconstructionGuidance(gamma=20.0, start_fraction=0.5,
                               n_corrector=1, delta=0.1)
    start_step = int(ddpm.num_steps * g.start_fraction)

    def eps_fn(xi, i):
        return ddpm.predict_noise_from_start(xi, i, 0.9 * xi)

    # the former implementation: one scan, grad masked by `active`
    def masked_sample(key, xT, condition):
        x0_model = make_x0_model(eps_fn, ddpm)

        def constraint_sum(xi, ib):
            return jnp.sum(lik.loss(x0_model(xi, ib), condition))

        def step(k, xi, i):
            k1, k2 = jax.random.split(k)
            ib = _batched(i, xi.shape[0])
            x_grad = jax.grad(constraint_sum)(xi, ib)
            alpha_i = ddpm.alphas[i]
            scale = g.gamma * alpha_i * (1.0 - alpha_i)
            active = (i < start_step).astype(xi.dtype)
            xi = xi - scale * active * x_grad
            xi_next = _posterior_step(k1, ddpm, x0_model(xi, ib), xi, ib)
            return _corrector_steps(k2, x0_model, ddpm, xi_next, ib,
                                    g.n_corrector, g.delta)

        step.num_steps = ddpm.num_steps
        return _reverse_scan(key, xT, step)

    split = make_conditional_sampler(eps_fn, ddpm, g, lik)
    xT = jax.random.normal(jax.random.PRNGKey(10), (B, H, W, C))
    out_split = jax.jit(split)(jax.random.PRNGKey(11), xT, cond_img)
    out_masked = jax.jit(masked_sample)(jax.random.PRNGKey(11), xT, cond_img)
    np.testing.assert_array_equal(np.asarray(out_split),
                                  np.asarray(out_masked))


def test_amortized_sampler_runs(ddpm):
    lik = InPainting(patch_size=4, pad_value=-2.0)
    truth = _images(jax.random.PRNGKey(12))
    cond = lik.sample(jax.random.PRNGKey(13), truth)

    def eps_fn(xi, i):  # amortized nets see 2C channels; return C
        return jnp.zeros(xi.shape[:-1] + (C,))

    sampler = make_conditional_sampler(
        eps_fn, ddpm, Amortized(n_corrector=1, delta=0.1), lik)
    xT = jax.random.normal(jax.random.PRNGKey(14), (B, H, W, C))
    x0 = jax.jit(sampler)(jax.random.PRNGKey(15), xT, cond)
    assert np.all(np.isfinite(np.asarray(x0)))
    assert x0.shape == (B, H, W, C)
