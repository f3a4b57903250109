from tpu_diffusion.core.schedules import (
    DDPM,
    VPSDE,
    bcast_right,
    betas_from_alphas_cumprod,
    cosine_alphas_cumprod,
    hoogeboom_alphas_cumprod,
    linear_betas,
    linear_vpsde_betas,
    quadratic_betas,
    sigmoid_betas,
)
from tpu_diffusion.core.ema import EMAState, ema_update

__all__ = [
    "DDPM", "VPSDE", "bcast_right", "betas_from_alphas_cumprod",
    "cosine_alphas_cumprod", "hoogeboom_alphas_cumprod", "linear_betas",
    "linear_vpsde_betas", "quadratic_betas", "sigmoid_betas",
    "EMAState", "ema_update",
]
