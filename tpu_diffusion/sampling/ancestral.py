"""Ancestral DDPM samplers (prior + three conditioning modes) and DDIM.

Rebuilds `amortised diffusion/image_diffusion/sampling.py` as jitted
`lax.scan` loops — the reference runs 1000 Python steps per batch
(sampling.py:198-202); here the whole reverse chain is one compiled program.

Interface: `eps_fn(x, i)` predicts noise for discrete steps `i` ([B] int32).
An amortized model additionally receives the condition as extra channels —
`make_*_sampler` builds that closure. Gradient guidance uses one
`jax.grad` through the summed per-sample constraint (exactly equivalent to
the reference's `vmap(grad(...))` at sampling.py:162-163, since samples do
not interact inside the network at inference).

TPU notes: guidance start gating (`i < Ns*start_fraction`) is data-independent
given the step index, expressed with `jnp.where` so the scan body stays
branch-free; the "no noise at i==0" rule is a `where` as well.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpu_diffusion.conditioning.guidance import (Amortized, Conditioning,
                                                 ReconstructionGuidance,
                                                 Replacement)
from tpu_diffusion.conditioning.likelihoods import Likelihood, Painting
from tpu_diffusion.core.schedules import DDPM

Array = jax.Array
EpsFn = Callable[[Array, Array], Array]


def process_x0(x: Array) -> Array:
    """Clip the x0 prediction into the data range (sampling.py:13-14)."""
    return jnp.clip(x, -1.0, 1.0)


def make_x0_model(eps_fn: EpsFn, ddpm: DDPM) -> Callable:
    def x0_model(xi: Array, i: Array) -> Array:
        return process_x0(ddpm.predict_start_from_noise(xi, i,
                                                        eps_fn(xi, i)))
    return x0_model


def amortized_eps_fn(eps_fn: EpsFn, condition: Array) -> EpsFn:
    """Concat the condition as extra channels before the eps model
    (sampling.py:36-44)."""
    def fn(xi: Array, i: Array) -> Array:
        return eps_fn(jnp.concatenate([xi, condition], axis=-1), i)
    return fn


def _posterior_step(key: Array, ddpm: DDPM, x0_pred: Array, xi: Array,
                    i: Array) -> Array:
    """One ancestral step: posterior mean + sigma * noise (none at i == 0)."""
    mean, _, logvar = ddpm.p_mean_variance(x0_pred, xi, i)
    noise = jax.random.normal(key, xi.shape, xi.dtype)
    keep_noise = (i > 0).astype(xi.dtype).reshape((-1,) + (1,) * (xi.ndim - 1))
    return mean + jnp.exp(0.5 * logvar) * noise * keep_noise


def _corrector_steps(key: Array, x0_model, ddpm: DDPM, xi: Array, i: Array,
                     n_corrector: int, delta: Array) -> Array:
    """`n_corrector` Langevin corrector steps (sampling.py:113-121)."""
    if n_corrector == 0:
        return xi
    dt = (ddpm.tmax - ddpm.tmin) / ddpm.num_steps

    def body(k, xi):
        ck = jax.random.fold_in(key, k)
        score = ddpm.score_from_x0(x0_model(xi, i), i)
        noise = jax.random.normal(ck, xi.shape, xi.dtype)
        return xi + 0.5 * dt * delta * score + jnp.sqrt(dt * delta) * noise

    return jax.lax.fori_loop(0, n_corrector, body, xi)


def _reverse_scan(key: Array, xT: Array, step_fn) -> Array:
    """Scan `step_fn(key, xi, i)` over i = Ns-1 .. 0."""
    num_steps = step_fn.num_steps

    def body(carry, i):
        xi, key = carry
        key, sk = jax.random.split(key)
        return (step_fn(sk, xi, i), key), None

    (x0, _), _ = jax.lax.scan(
        body, (xT, key), jnp.arange(num_steps - 1, -1, -1))
    return process_x0(x0)


def _batched(i: Array, batch: int) -> Array:
    return jnp.full((batch,), i, jnp.int32)


# ---------------------------------------------------------------------------
# Prior sampling (sampling.py:50-75)
# ---------------------------------------------------------------------------


def make_prior_sampler(eps_fn: EpsFn, ddpm: DDPM,
                       conditioning: Optional[Conditioning] = None,
                       likelihood: Optional[Likelihood] = None) -> Callable:
    """Unconditional ancestral sampling. For an amortized model the "none"
    condition rides along as pad channels (sampling.py:36-44)."""

    def sample(key: Array, xT: Array) -> Array:
        fn = eps_fn
        if isinstance(conditioning, Amortized):
            assert likelihood is not None
            fn = amortized_eps_fn(eps_fn, likelihood.none_like(xT))
        x0_model = make_x0_model(fn, ddpm)

        def step(k, xi, i):
            ib = _batched(i, xi.shape[0])
            return _posterior_step(k, ddpm, x0_model(xi, ib), xi, ib)

        step.num_steps = ddpm.num_steps
        return _reverse_scan(key, xT, step)

    return sample


# ---------------------------------------------------------------------------
# Conditional sampling (dispatch on conditioning type)
# ---------------------------------------------------------------------------


def make_conditional_sampler(eps_fn: EpsFn, ddpm: DDPM,
                             conditioning: Conditioning,
                             likelihood: Likelihood) -> Callable:
    """sample(key, xT, condition) -> x0. Mirrors plum dispatch at
    sampling.py:81-260."""
    if isinstance(conditioning, Amortized):
        return _make_amortized_sampler(eps_fn, ddpm, conditioning, likelihood)
    if isinstance(conditioning, ReconstructionGuidance):
        return _make_guidance_sampler(eps_fn, ddpm, conditioning, likelihood)
    if isinstance(conditioning, Replacement):
        return _make_replacement_sampler(eps_fn, ddpm, conditioning,
                                         likelihood)
    raise NotImplementedError(type(conditioning))


def _make_amortized_sampler(eps_fn, ddpm, cond: Amortized, likelihood):
    def sample(key: Array, xT: Array, condition: Array) -> Array:
        x0_model = make_x0_model(amortized_eps_fn(eps_fn, condition), ddpm)
        # The reference's corrector runs UNconditioned: its corrector_step
        # calls x0_model(xi, t) with cond defaulting to None, which the
        # amortized x0 model fills with likelihood.none_like pad channels
        # (sampling.py:34-44, :113-121) — only the posterior step sees the
        # condition.
        x0_uncond = make_x0_model(
            amortized_eps_fn(eps_fn, likelihood.none_like(condition)), ddpm)

        def step(k, xi, i):
            k1, k2 = jax.random.split(k)
            ib = _batched(i, xi.shape[0])
            xi = _posterior_step(k1, ddpm, x0_model(xi, ib), xi, ib)
            return _corrector_steps(k2, x0_uncond, ddpm, xi, ib,
                                    cond.n_corrector, cond.delta)

        step.num_steps = ddpm.num_steps
        return _reverse_scan(key, xT, step)

    return sample


def make_cached_amortized_sampler(encode_fn: Callable, decode_fn: Callable,
                                  ddpm: DDPM, cond: Amortized,
                                  likelihood: Likelihood,
                                  encoder_reuse: int = 2) -> Callable:
    """Amortized ancestral sampling with encoder-feature reuse
    (arXiv:2312.09608) — the same caching scheme as
    `make_cached_ddim_sampler`, applied to the reference's 1000-step
    conditional eval path (sampling.py:81-133): the UNet encoder cache
    refreshes every `encoder_reuse`-th reverse step; posterior and
    corrector steps in between decode from it with the current timestep
    embedding (corrector iterates share their step's cache too).
    `encoder_reuse=1` with `n_corrector=0` reproduces
    `_make_amortized_sampler` bitwise (pinned by tests).

    Note: with `n_corrector > 0` the cached corrector decodes from the
    CONDITIONED cache, whereas the reference (and the plain sampler here)
    runs the corrector unconditioned (sampling.py:113-121 with cond=None);
    an unconditioned corrector would need a second encoder pass per
    refresh, defeating the cache.

    `encoder_reuse` need not divide `num_steps`: the remainder runs as a
    shorter FIRST group at the high-noise end of the chain (one extra
    encoder refresh where the iterate changes fastest), then the uniform
    K-sized groups run in one `lax.scan` — all shapes stay static."""
    if encoder_reuse < 1:
        raise ValueError(f"encoder_reuse={encoder_reuse} must be >= 1")
    rem = ddpm.num_steps % encoder_reuse
    idx = jnp.arange(ddpm.num_steps - 1, -1, -1)
    head = idx[:rem]
    groups = idx[rem:].reshape((ddpm.num_steps - rem) // encoder_reuse,
                               encoder_reuse)

    def sample(key: Array, xT: Array, condition: Array) -> Array:
        enc = lambda xi, ib: encode_fn(
            jnp.concatenate([xi, condition], axis=-1), ib)
        dec = lambda xi, ib, cache: decode_fn(
            jnp.concatenate([xi, condition], axis=-1), ib, cache)

        def run_group(xi, key, idx_row, n):
            cache = None
            for j in range(n):
                ib = _batched(idx_row[j], xi.shape[0])
                # key discipline mirrors _reverse_scan + the amortized
                # step exactly, so encoder_reuse=1 is bitwise-identical
                key, sk = jax.random.split(key)
                k1, k2 = jax.random.split(sk)
                if j == 0:
                    cache = enc(xi, ib)
                x0_model = lambda x, i: process_x0(
                    ddpm.predict_start_from_noise(x, i, dec(x, i, cache)))
                xi = _posterior_step(k1, ddpm, x0_model(xi, ib), xi, ib)
                xi = _corrector_steps(k2, x0_model, ddpm, xi, ib,
                                      cond.n_corrector, cond.delta)
            return xi, key

        def body(carry, idx_row):
            xi, key = run_group(*carry, idx_row, encoder_reuse)
            return (xi, key), None

        xi = xT
        if rem:
            xi, key = run_group(xi, key, head, rem)
        (x0, _), _ = jax.lax.scan(body, (xi, key), groups)
        return process_x0(x0)

    return sample


def _make_guidance_sampler(eps_fn, ddpm, cond: ReconstructionGuidance,
                           likelihood):
    start_step = int(ddpm.num_steps * cond.start_fraction)

    def sample(key: Array, xT: Array, condition: Array) -> Array:
        x0_model = make_x0_model(eps_fn, ddpm)

        def constraint_sum(xi, ib):
            return jnp.sum(likelihood.loss(x0_model(xi, ib), condition))

        def plain_step(k, xi, i):
            # i >= start_step: guidance inactive — no grad, one model eval
            # (the reference computes x_grad only when i < Ns*start_fraction;
            # a single scan with `active`-masking would still pay the
            # forward+backward on every inactive step)
            k1, k2 = jax.random.split(k)
            ib = _batched(i, xi.shape[0])
            xi_next = _posterior_step(k1, ddpm, x0_model(xi, ib), xi, ib)
            return _corrector_steps(k2, x0_model, ddpm, xi_next, ib,
                                    cond.n_corrector, cond.delta)

        def guided_step(k, xi, i):
            k1, k2 = jax.random.split(k)
            ib = _batched(i, xi.shape[0])

            # Guidance gradient through the x0 prediction. grad of the
            # batch-summed per-sample loss == per-sample vmap(grad)
            # (sampling.py:154-163) because inference couples no samples.
            x_grad = jax.grad(constraint_sum)(xi, ib)
            alpha_i = ddpm.alphas[i]
            scale = cond.gamma * alpha_i * (1.0 - alpha_i)
            x_update = -scale * x_grad

            if cond.update_rule == "before":
                xi = xi + x_update
            xi_next = _posterior_step(k1, ddpm, x0_model(xi, ib), xi, ib)
            if cond.update_rule == "after":
                xi_next = xi_next + x_update
            return _corrector_steps(k2, x0_model, ddpm, xi_next, ib,
                                    cond.n_corrector, cond.delta)

        # Two scans over the statically-known split i = Ns-1..start_step
        # (plain) then start_step-1..0 (guided); the key carry crosses the
        # boundary, so the PRNG stream — and therefore the output — is
        # bitwise-identical to the former single masked scan.
        def body(step_fn):
            def b(carry, i):
                xi, k = carry
                k, sk = jax.random.split(k)
                return (step_fn(sk, xi, i), k), None
            return b

        carry = (xT, key)
        carry, _ = jax.lax.scan(
            body(plain_step), carry,
            jnp.arange(ddpm.num_steps - 1, start_step - 1, -1))
        carry, _ = jax.lax.scan(
            body(guided_step), carry,
            jnp.arange(start_step - 1, -1, -1))
        return process_x0(carry[0])

    return sample


def _make_replacement_sampler(eps_fn, ddpm, cond: Replacement, likelihood):
    if not isinstance(likelihood, Painting):
        raise NotImplementedError(
            "Replacement conditioning requires a Painting likelihood with a "
            "pad_value mask (reference sampling.py:225-232)")
    start_step = int(ddpm.num_steps * cond.start_fraction)

    def sample(key: Array, xT: Array, condition: Array) -> Array:
        x0_model = make_x0_model(eps_fn, ddpm)
        observed = likelihood.observed_mask(condition)

        def step(k, xi, i):
            k1, k2, k3 = jax.random.split(k, 3)
            ib = _batched(i, xi.shape[0])
            if cond.noise:
                noised, _ = ddpm.q_sample(k3, condition, ib)
            else:
                noised = condition
            active = i < start_step
            xi = jnp.where(jnp.logical_and(observed, active), noised, xi)
            xi = _posterior_step(k1, ddpm, x0_model(xi, ib), xi, ib)
            return _corrector_steps(k2, x0_model, ddpm, xi, ib,
                                    cond.n_corrector, cond.delta)

        step.num_steps = ddpm.num_steps
        return _reverse_scan(key, xT, step)

    return sample


# ---------------------------------------------------------------------------
# DDIM (new first-class sampler; the throughput benchmark path)
# ---------------------------------------------------------------------------


def _ddim_per_step(ddpm: DDPM, num_steps: int, eta: float):
    """Stacked per-step DDIM coefficients (descending step order):
    rows of [i, c_x0, c_dir, sqrt(abar), sigma, sr, srm1]."""
    import numpy as np

    if not 0 < num_steps <= ddpm.num_steps:
        raise ValueError(
            f"num_steps={num_steps} must be in [1, ddpm.num_steps="
            f"{ddpm.num_steps}] (a zero stride would silently run every "
            f"DDIM step at index 0)")
    stride = ddpm.num_steps // num_steps
    steps = np.arange(num_steps) * stride  # ascending; scan runs descending
    abar_all = np.asarray(ddpm.alphas_cumprod, np.float64)
    abar = abar_all[steps]
    abar_prev = np.concatenate([[1.0], abar[:-1]])
    sigma = eta * np.sqrt((1 - abar_prev) / (1 - abar)
                          * (1 - abar / abar_prev))
    # xi_next = c_x0 * x0 + c_dir * (xi - sqrt(abar) x0) + sigma * noise
    c_x0 = np.sqrt(abar_prev)
    c_dir = (np.sqrt(np.maximum(1 - abar_prev - sigma ** 2, 0.0))
             / np.sqrt(1 - abar))
    c_sqrt_abar = np.sqrt(abar)
    # x0 = sr * xi - srm1 * eps (predict_start_from_noise, un-gathered)
    sr = np.sqrt(1.0 / abar)
    srm1 = np.sqrt(1.0 / abar - 1.0)
    return jnp.asarray(
        np.stack([steps.astype(np.float64), c_x0, c_dir, c_sqrt_abar,
                  sigma, sr, srm1], axis=-1)[::-1], jnp.float32)


def _ddim_update(xi, eps, row, key, eta):
    """One DDIM update from a coefficient row; returns (xi_next, key)."""
    i, cx0, cdir, sab, sig, sr, srm1 = (
        row[0], row[1], row[2], row[3], row[4], row[5], row[6])
    del i
    x0 = process_x0(sr * xi - srm1 * eps)
    xi_next = cx0 * x0 + cdir * (xi - sab * x0)
    if eta != 0.0:
        key, nk = jax.random.split(key)
        xi_next = xi_next + sig * jax.random.normal(nk, xi.shape, xi.dtype)
    return xi_next, key


def make_ddim_sampler(eps_fn: EpsFn, ddpm: DDPM, num_steps: int = 100,
                      eta: float = 0.0) -> Callable:
    """Deterministic (eta=0) / stochastic DDIM over a strided substep grid.

    Not present in the reference; this is the fixed-NFE sampler the
    samples/sec/chip benchmark measures (BASELINE.md north star).

    All per-step schedule scalars are precomputed at trace time and fed to
    the `lax.scan` as stacked inputs, so the compiled body contains only the
    UNet forward plus a handful of fused elementwise ops — no buffer gathers.
    For eta=0 the noise term is dropped before tracing (no per-step RNG).
    """
    per_step = _ddim_per_step(ddpm, num_steps, eta)

    def sample(key: Array, xT: Array,
               condition: Optional[Array] = None) -> Array:
        fn = eps_fn if condition is None else amortized_eps_fn(eps_fn,
                                                               condition)

        def body(carry, row):
            xi, key = carry
            ib = jnp.full((xi.shape[0],), row[0].astype(jnp.int32))
            eps = fn(xi, ib)
            xi_next, key = _ddim_update(xi, eps, row, key, eta)
            return (xi_next, key), None

        (x0, _), _ = jax.lax.scan(body, (xT, key), per_step)
        return process_x0(x0)

    return sample


def make_cached_ddim_sampler(encode_fn: Callable, decode_fn: Callable,
                             ddpm: DDPM, num_steps: int = 100,
                             eta: float = 0.0,
                             encoder_reuse: int = 2) -> Callable:
    """DDIM with encoder-feature reuse across adjacent steps
    ("Faster Diffusion", arXiv:2312.09608; PAPERS.md).

    The UNet encoder's skip features change slowly between neighbouring
    timesteps, so the sampler refreshes the `(bottleneck, skips)` cache via
    `encode_fn(x_cat, i) -> cache` only every `encoder_reuse`-th step and
    runs `decode_fn(x_cat, i, cache) -> eps` (middle + decoder, with the
    CURRENT timestep embedding) on the steps in between — skipping roughly
    half the UNet on the skipped steps. `encoder_reuse=1` is EXACTLY the
    plain DDIM sampler (pinned by tests/test_conditioning.py).

    The step grid is processed in groups of `encoder_reuse` inside one
    `lax.scan` (inner steps unrolled), keeping the whole chain one compiled
    program like every other sampler here. A non-dividing `encoder_reuse`
    runs the remainder as a shorter first group at the high-noise end
    (same scheme as `make_cached_amortized_sampler`).
    """
    if encoder_reuse < 1:
        raise ValueError(f"encoder_reuse={encoder_reuse} must be >= 1")
    rem = num_steps % encoder_reuse
    per_step = _ddim_per_step(ddpm, num_steps, eta)
    head = per_step[:rem]
    groups = per_step[rem:].reshape((num_steps - rem) // encoder_reuse,
                                    encoder_reuse, per_step.shape[-1])

    def sample(key: Array, xT: Array,
               condition: Optional[Array] = None) -> Array:
        if condition is None:
            enc = encode_fn
            dec = decode_fn
        else:
            enc = lambda xi, i: encode_fn(
                jnp.concatenate([xi, condition], axis=-1), i)
            dec = lambda xi, i, cache: decode_fn(
                jnp.concatenate([xi, condition], axis=-1), i, cache)

        def run_group(xi, key, rows, n):
            cache = None
            for j in range(n):
                row = rows[j]
                ib = jnp.full((xi.shape[0],), row[0].astype(jnp.int32))
                if j == 0:
                    cache = enc(xi, ib)
                eps = dec(xi, ib, cache)
                xi, key = _ddim_update(xi, eps, row, key, eta)
            return xi, key

        def body(carry, rows):
            xi, key = run_group(*carry, rows, encoder_reuse)
            return (xi, key), None

        xi = xT
        if rem:
            xi, key = run_group(xi, key, head, rem)
        (x0, _), _ = jax.lax.scan(body, (xi, key), groups)
        return process_x0(x0)

    return sample
