"""Image quality metrics on-device (MSE / PSNR / SSIM), replacing the
reference's skimage calls (mnist/train_mnist_hy.py:181-205) with jittable
batched ops so eval never leaves the chip.

SSIM follows skimage.metrics.structural_similarity defaults (uniform 7x7
window, K1=0.01, K2=0.03) for comparable numbers.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def mse(a: Array, b: Array) -> Array:
    """Per-sample MSE over [B, H, W, C]."""
    return jnp.mean((a - b) ** 2, axis=(1, 2, 3))


def psnr(a: Array, b: Array, data_range: float = 2.0) -> Array:
    """Per-sample PSNR; default range 2.0 for [-1, 1] images."""
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse(a, b), 1e-12))


def _uniform_filter(x: Array, size: int) -> Array:
    """Mean filter with a size x size window, valid padding. x: [B,H,W,C]."""
    kernel = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    c = x.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def ssim(a: Array, b: Array, data_range: float = 2.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03) -> Array:
    """Per-sample mean SSIM over [B, H, W, C] (channels averaged)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _uniform_filter(a, win_size)
    mu_b = _uniform_filter(b, win_size)
    # skimage uses unbiased covariances: E[xy] - mu_x mu_y scaled n/(n-1)
    n = win_size * win_size
    cov_norm = n / (n - 1)
    var_a = cov_norm * (_uniform_filter(a * a, win_size) - mu_a**2)
    var_b = cov_norm * (_uniform_filter(b * b, win_size) - mu_b**2)
    cov = cov_norm * (_uniform_filter(a * b, win_size) - mu_a * mu_b)
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def eval_statistics(pred: Array, truth: Array,
                    data_range: float = 2.0) -> Dict[str, Array]:
    """mean/median/std of MSE, PSNR, SSIM over the batch — the statistics
    blob written to results.json (experiments/main.py:304-314)."""
    out = {}
    for name, vals in [("mse", mse(pred, truth)),
                       ("psnr", psnr(pred, truth, data_range)),
                       ("ssim", ssim(pred, truth, data_range))]:
        out[f"{name}_mean"] = jnp.mean(vals)
        out[f"{name}_median"] = jnp.median(vals)
        out[f"{name}_std"] = jnp.std(vals)
    return out
