"""DDPM training objectives (generic + amortized condition-dropout).

Rebuilds `amortised diffusion/image_diffusion/loss_functions.py`. The eps
model adapter maps discrete i -> t = i/Ns (loss_functions.py:18-19) — here
the caller-facing network signature is `net(x, t_cont)` and the samplers work
on discrete steps, so the adapter lives here once.

Everything takes explicit PRNG keys and is fully batched; the amortized loss
draws the condition-vs-none Bernoulli *per batch* exactly as the reference
does with `torch.rand(()) < p_cond` (loss_functions.py:47-50).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_diffusion.conditioning.guidance import Amortized, Conditioning
from tpu_diffusion.conditioning.likelihoods import Likelihood
from tpu_diffusion.core.schedules import DDPM

Array = jax.Array
Network = Callable[..., Array]  # net(x, t[, ...]) -> eps


def make_eps_model(net: Network, ddpm: DDPM) -> Callable[[Array, Array], Array]:
    """Adapter: discrete step i -> continuous t = i / Ns."""
    def eps_model(xi: Array, i: Array) -> Array:
        return net(xi, i.astype(jnp.float32) / ddpm.num_steps)
    return eps_model


def ddpm_loss(key: Array, net: Network, ddpm: DDPM, x: Array) -> Array:
    """Plain eps-matching MSE (loss_functions.py:13-33)."""
    ki, kq = jax.random.split(key)
    i = jax.random.randint(ki, (x.shape[0],), 0, ddpm.num_steps)
    xi, eps = ddpm.q_sample(kq, x, i)
    eps_hat = make_eps_model(net, ddpm)(xi, i)
    return jnp.mean((eps_hat - eps) ** 2)


def amortized_ddpm_loss(key: Array, net: Network, ddpm: DDPM,
                        conditioning: Amortized, likelihood: Likelihood,
                        x: Array) -> Array:
    """Condition-dropout amortized loss (loss_functions.py:36-62): with prob
    p_cond concat a likelihood draw, else the pad "none" condition."""
    kc, kb, ki, kq = jax.random.split(key, 4)
    cond = likelihood.sample(kc, x)
    none = likelihood.none_like(x)
    use_cond = jax.random.uniform(kb, ()) < conditioning.p_cond
    condition = jnp.where(use_cond, cond, none)

    i = jax.random.randint(ki, (x.shape[0],), 0, ddpm.num_steps)
    xi, eps = ddpm.q_sample(kq, x, i)
    xi_cond = jnp.concatenate([xi, condition], axis=-1)
    eps_hat = make_eps_model(net, ddpm)(xi_cond, i)
    return jnp.mean((eps_hat - eps) ** 2)


def get_loss_function(net: Network, ddpm: DDPM, conditioning: Conditioning,
                      likelihood: Optional[Likelihood] = None
                      ) -> Tuple[Callable, Callable]:
    """(loss_fn(key, x) -> scalar, eps_model(x, i)) — the reference's
    dispatch (loss_functions.py:13,36) keyed on the conditioning type."""
    if isinstance(conditioning, Amortized):
        assert likelihood is not None
        def loss_fn(key, x):
            return amortized_ddpm_loss(key, net, ddpm, conditioning,
                                       likelihood, x)
    else:
        def loss_fn(key, x):
            return ddpm_loss(key, net, ddpm, x)
    return loss_fn, make_eps_model(net, ddpm)


def weighted_mask_loss(vt: Array, ut: Array, weight: Array) -> Array:
    """Pixel-weighted CFM loss (mnist/train_mnist2.py:176-193's
    `get_loss_weight_mask` semantics: e.g. 10x weight inside the masked
    patch)."""
    return jnp.mean(weight * (vt - ut) ** 2)
