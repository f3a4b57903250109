"""Encoder-reuse DDIM ("Faster Diffusion", arXiv:2312.09608) vs plain DDIM
on the real TPU: the bench config's CIFAR-10 UNet, 100 sampler steps, with
the encoder+skip cache refreshed every K steps (K=1 == plain).

Prints one JSON row per K with samples/s and the mean|Δ| vs the K=1 output
(same key, same noise) as the fidelity proxy.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import make_cached_ddim_sampler

BATCH = 64
STEPS = 100


def main():
    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2,
        channel_mult=(1, 2, 2, 2), num_heads=4,
        attention_resolutions="16", dropout=0.0,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
        norm_dtype=jnp.bfloat16, attention_impl="xla")
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.zeros((BATCH,))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    # non-trivial eps-hat so the fidelity proxy is meaningful
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(str(path)) % (2**31)), p.shape,
            jnp.float32).astype(p.dtype)
        if "conv_out" in str(path) else p, params)

    ddpm = DDPM.create(1000)

    def encode_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0,
                           mode="encode")

    def decode_fn(xi, i, cache):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0,
                           mode="decode", cache=cache)

    key = jax.random.PRNGKey(1)
    xT = jax.random.normal(key, (BATCH, 32, 32, 3))
    baseline = None
    for reuse in (1, 2, 4):
        sampler = jax.jit(make_cached_ddim_sampler(
            encode_fn, decode_fn, ddpm, num_steps=STEPS,
            encoder_reuse=reuse))
        out = sampler(key, xT)
        _ = float(np.asarray(out).ravel()[0])  # warm + completion
        n = 5
        t0 = time.perf_counter()
        for k in range(n):
            out = sampler(jax.random.fold_in(key, k), xT)
        _ = float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / n
        ref_out = sampler(key, xT)
        if reuse == 1:
            baseline = np.asarray(ref_out)
            delta = 0.0
        else:
            delta = float(np.mean(np.abs(np.asarray(ref_out) - baseline)))
        print(json.dumps({
            "encoder_reuse": reuse,
            "samples_per_sec": round(BATCH / dt, 2),
            "step_time_ms": round(dt * 1000 / STEPS, 3),
            "mean_abs_delta_vs_plain": round(delta, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
