"""Differentiable rigid-body geometry (Kabsch alignment, rototranslation).

Rebuilds `amortised diffusion/src/utils/geometry.py`: the reference's
`differentiable_kabsch` (:8-83) detects degenerate singular values and
retries with noise inside a Python loop; under jit we instead regularize
deterministically (tie-break jitter on the cross-covariance) — SVD and its
gradient are XLA-native.

All functions are batched over a leading axis where noted and respect
node masks (padded dense graphs).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_mean(x: Array, mask: Optional[Array], axis: int,
                keepdims: bool = True) -> Array:
    """Mean over `axis` counting only mask==True rows. mask: x.shape[:-1]."""
    if mask is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    m = mask[..., None].astype(x.dtype)
    total = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    count = jnp.maximum(jnp.sum(m, axis=axis, keepdims=keepdims), 1.0)
    return total / count


def center(pos: Array, mask: Optional[Array] = None) -> Array:
    """Remove the (masked) center of mass. pos: [..., N, 3]."""
    return pos - masked_mean(pos, mask, axis=-2)


def kabsch(mobile: Array, target: Array,
           weights: Optional[Array] = None) -> Tuple[Array, Array]:
    """Optimal rotation R and translation u with R @ mobile + u ~= target.

    mobile/target: [N, 3] (vmap for batches). Differentiable through SVD.
    Returns (R [3,3], t [3]).
    """
    if weights is None:
        w = jnp.ones(mobile.shape[:-1], mobile.dtype)
    else:
        w = weights
    w = w / jnp.maximum(jnp.sum(w), 1e-8)
    mu_m = jnp.sum(mobile * w[:, None], axis=0)
    mu_t = jnp.sum(target * w[:, None], axis=0)
    m = mobile - mu_m
    t = target - mu_t
    # cross-covariance; tiny diagonal tie-break keeps SVD gradients finite
    # when singular values collide (reference geometry.py:45-75 retries with
    # noise instead)
    h = (m * w[:, None]).T @ t + 1e-8 * jnp.eye(3, dtype=mobile.dtype)
    u, _, vt = jnp.linalg.svd(h, full_matrices=False)
    det = jnp.linalg.det(vt.T @ u.T)
    d = jnp.diag(jnp.array([1.0, 1.0, 1.0], mobile.dtype)).at[2, 2].set(det)
    rot = vt.T @ d @ u.T
    trans = mu_t - rot @ mu_m
    return rot, trans


def kabsch_align(mobile: Array, target: Array,
                 weights: Optional[Array] = None) -> Array:
    """Return mobile rototranslated onto target."""
    rot, trans = kabsch(mobile, target, weights)
    return mobile @ rot.T + trans


def rmsd(a: Array, b: Array) -> Array:
    """Root-mean-square deviation after NO alignment. a,b: [N, 3]."""
    return jnp.sqrt(jnp.mean(jnp.sum((a - b) ** 2, axis=-1)))


def aligned_rmsd(mobile: Array, target: Array) -> Array:
    return rmsd(kabsch_align(mobile, target), target)


def rototranslate(pos: Array, rot: Array, trans: Array) -> Array:
    """Apply (R, t) to [..., N, 3] positions (reference geometry.py:84-116)."""
    return pos @ jnp.swapaxes(rot, -1, -2) + trans[..., None, :]


def random_rotation_matrix(key: Array, dtype=jnp.float32) -> Array:
    """Uniform random rotation via QR of a Gaussian (reference :117+)."""
    a = jax.random.normal(key, (3, 3), dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return q * jnp.linalg.det(q)
