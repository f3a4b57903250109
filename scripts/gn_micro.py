"""Micro-benchmark: fused Pallas GroupNorm+SiLU vs XLA chain, real TPU."""
import functools
import time

import jax
import jax.numpy as jnp

from tpu_diffusion.kernels.groupnorm import fused_groupnorm_silu

SHAPES = [(64, 32, 32, 128), (64, 16, 16, 256), (64, 8, 8, 256), (64, 4, 4, 256)]


def xla_chain(x, gamma, beta):
    xf = x.astype(jnp.float32)
    b, h, w, c = x.shape
    xg = xf.reshape(b, h * w, 32, c // 32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w, c)
    y = xn * gamma + beta
    return jax.nn.silu(y).astype(x.dtype)


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    for shape in SHAPES:
        b, h, w, c = shape
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        f_fused = jax.jit(functools.partial(fused_groupnorm_silu,
                                            num_groups=32))
        f_xla = jax.jit(xla_chain)
        t_fused = bench(f_fused, x, gamma, beta)
        t_xla = bench(f_xla, x, gamma, beta)
        mb = b * h * w * c * 2 * 2 / 1e6  # read+write bf16
        print(f"{shape}: fused {t_fused*1e6:8.1f}us ({mb/t_fused/1e3:6.1f} "
              f"GB/s)  xla {t_xla*1e6:8.1f}us ({mb/t_xla/1e3:6.1f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
