"""Graph diffusion processes over padded dense protein batches.

Rebuilds `amortised diffusion/src/diffusion/sde_diffusion.py`
(`HoogeboomGraphSDE` :188-425, `VPGraphSDE` :469-651) for TPU: a protein
batch is (pos [B, N, 3], mask [B, N]) — no PyG sparse batching, no per-graph
Python loops. Center-of-mass-free noise is a masked projection; the reverse
chain is one `lax.scan`.

Schedule: Hoogeboom polynomial alpha_bar(t) = (1 - t^e)^2 (1-2s) + s with
beta(t) = -d/dt log alpha_bar(t) obtained in closed form (the reference
computes it with torch autograd, :200-204) and the same clip at 0.25.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tpu_diffusion.protein.geometry import center, masked_mean

Array = jax.Array


class ProteinBatch(NamedTuple):
    """Padded dense graph batch."""

    pos: Array            # [B, N, 3]
    mask: Array           # [B, N] bool
    node_order: Array     # [B, N] int32 chain positions

    @property
    def num_graphs(self) -> int:
        return self.pos.shape[0]

    @classmethod
    def from_positions(cls, pos: Array, mask: Optional[Array] = None
                       ) -> "ProteinBatch":
        b, n, _ = pos.shape
        if mask is None:
            mask = jnp.ones((b, n), bool)
        order = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
        return cls(pos=pos, mask=mask, node_order=order)


def com_free_noise(key: Array, pos: Array, mask: Array) -> Array:
    """White noise with the masked center of mass removed per graph
    (reference noise_like, :392-404 — a Python loop over graphs there)."""
    z = jax.random.normal(key, pos.shape, pos.dtype)
    z = z - masked_mean(z, mask, axis=-2)
    return z * mask[..., None].astype(pos.dtype)


@struct.dataclass
class HoogeboomGraphSDE:
    """Polynomial alpha_bar schedule + COM-free graph DDPM."""

    num_steps: int = struct.field(pytree_node=False, default=250)
    s: float = struct.field(pytree_node=False, default=1e-5)
    clip_value: float = struct.field(pytree_node=False, default=0.25)
    exponent: int = struct.field(pytree_node=False, default=2)

    # -- continuous schedule ------------------------------------------------

    def alphas_cumprod_fn(self, t: Array) -> Array:
        return (1.0 - t**self.exponent) ** 2 * (1 - 2 * self.s) + self.s

    def beta_fn(self, t: Array) -> Array:
        """-d/dt log alpha_bar, closed form."""
        e = self.exponent
        abar = self.alphas_cumprod_fn(t)
        dabar = -2.0 * (1.0 - t**e) * e * t ** (e - 1) * (1 - 2 * self.s)
        return -dabar / abar

    # -- discrete buffers ----------------------------------------------------

    @property
    def ts(self) -> Array:
        return jnp.linspace(0.0, 1.0, self.num_steps)

    @property
    def alphas_cumprod(self) -> Array:
        return self.alphas_cumprod_fn(self.ts)

    @property
    def discrete_betas(self) -> Array:
        return jnp.clip(self.beta_fn(self.ts) / self.num_steps,
                        None, self.clip_value)

    @property
    def alphas(self) -> Array:
        return 1.0 - self.discrete_betas

    # -- forward -------------------------------------------------------------

    def marginal_prob(self, t: Array) -> Tuple[Array, Array]:
        abar = self.alphas_cumprod_fn(t)
        return jnp.sqrt(abar), jnp.sqrt(1.0 - abar)

    def noising(self, key: Array, batch: ProteinBatch, t: Array
                ) -> Tuple[ProteinBatch, Array]:
        """q(x_t | x_0) with COM-free noise; t: [B]."""
        mean_s, std_s = self.marginal_prob(t)
        eps = com_free_noise(key, batch.pos, batch.mask)
        pos = mean_s[:, None, None] * batch.pos + std_s[:, None, None] * eps
        return batch._replace(pos=pos * batch.mask[..., None]), eps

    def denoising(self, batch: ProteinBatch, eps: Array, t: Array
                  ) -> ProteinBatch:
        """x0_hat = (x_t - sigma eps) / mu  (total denoise, :417-425)."""
        mean_s, std_s = self.marginal_prob(t)
        pos = (batch.pos - std_s[:, None, None] * eps) / mean_s[:, None, None]
        return batch._replace(pos=pos * batch.mask[..., None])

    # -- prior ----------------------------------------------------------------

    def sample_blob(self, key: Array, num_samples: int, num_atoms: int,
                    lengths: Optional[Array] = None) -> ProteinBatch:
        """COM-centered Gaussian blob prior (:261-280). `lengths` ([B]) masks
        ragged proteins inside the fixed [B, N] canvas."""
        if lengths is None:
            mask = jnp.ones((num_samples, num_atoms), bool)
        else:
            mask = (jnp.arange(num_atoms)[None, :] < lengths[:, None])
        pos = jax.random.normal(key, (num_samples, num_atoms, 3))
        pos = center(pos, mask) * mask[..., None]
        return ProteinBatch.from_positions(pos, mask)

    # -- reverse --------------------------------------------------------------

    def reverse_diffusion_sampling(
            self, key: Array, batch: ProteinBatch,
            score_model: Callable[[ProteinBatch, Array], Array],
            conditioner=None, cond_start_step: int = 125,
            no_noise_steps: int = 3,
            save_trajectory: bool = False):
        """Ancestral reverse chain as one lax.scan (:299-351).

        score_model(batch, t_normalized[B]) -> eps_hat [B, N, 3].
        The conditioner hook fires for step < cond_start_step; the last
        `no_noise_steps` steps add no noise (reference `step > 2`).
        """
        b = batch.num_graphs

        def step_fn(carry, step):
            pos, k = carry
            k, kz = jax.random.split(k)
            a = self.alphas[step]
            abar = self.alphas_cumprod[step]
            t = jnp.full((b,), step / self.num_steps, pos.dtype)
            cur = batch._replace(pos=pos)

            # The reference computes noise_hat BEFORE the conditioner
            # update and then applies the DDPM step with that (stale)
            # noise_hat on the updated positions (sde_diffusion.py:324,
            # :332-336, :339-341) — same order here.
            eps_hat = score_model(cur, t)

            if conditioner is not None:
                update = conditioner.apply(cur, score_model, step,
                                           self)  # [B, N, 3]
                active = (step < cond_start_step).astype(pos.dtype)
                pos = pos + active * update
            z = com_free_noise(kz, pos, batch.mask)
            keep_noise = (step > no_noise_steps - 1).astype(pos.dtype)
            pos = (pos - (1 - a) / jnp.sqrt(1 - abar) * eps_hat) \
                / jnp.sqrt(a) + jnp.sqrt(1 - a) * z * keep_noise
            pos = pos * batch.mask[..., None]
            out = pos if save_trajectory else None
            return (pos, k), out

        steps = jnp.arange(self.num_steps - 1, -1, -1)
        (pos, _), traj = jax.lax.scan(step_fn, (batch.pos, key), steps)
        result = batch._replace(pos=pos)
        if save_trajectory:
            return traj, result
        return result


@struct.dataclass
class VPGraphSDE(HoogeboomGraphSDE):
    """Linear-beta VP mirror (:469-651): alpha_bar = exp(-int beta)."""

    beta_min: float = struct.field(pytree_node=False, default=0.1)
    beta_max: float = struct.field(pytree_node=False, default=20.0)

    def alphas_cumprod_fn(self, t: Array) -> Array:
        ib = self.beta_min * t + (self.beta_max - self.beta_min) * t**2 / 2
        return jnp.exp(-ib)

    def beta_fn(self, t: Array) -> Array:
        return self.beta_min + (self.beta_max - self.beta_min) * t
