"""Perf probes for the DDIM bench: batch size, attention impl, dtype mix.

Usage: python scripts/perf_probe.py [probe ...]
Probes: fwd (raw UNet forward), batch (256 vs 512), pallas (attention impl).
"""

import sys
import time

import jax
import jax.numpy as jnp

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import make_ddim_sampler


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def build(attention_impl="xla"):
    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2, in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4, attention_resolutions="16",
        use_scale_shift_norm=True, attention_impl=attention_impl)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1,)))
    return model, params


def probe_fwd(batch=256):
    model, params = build()
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
    t = jnp.zeros((batch,))
    f32 = jax.jit(lambda x: model.apply(params, x, t))
    dt = timeit(f32, x)
    print(f"fwd b={batch}: {dt*1e3:.2f} ms -> {batch/dt:.0f} img/s")
    xb = x.astype(jnp.bfloat16)
    dtb = timeit(f32, xb)
    print(f"fwd b={batch} bf16 input: {dtb*1e3:.2f} ms")


def probe_batch():
    model, params = build()
    ddpm = DDPM.create(1000)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    for batch in [128, 256, 512]:
        sampler = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=100))
        xT = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3))
        dt = timeit(lambda k, x: sampler(k, x), jax.random.PRNGKey(0), xT,
                    iters=3)
        print(f"ddim100 b={batch}: {dt*1e3:.1f} ms -> "
              f"{batch/dt:.1f} samples/s")


def probe_pallas(batch=256):
    for impl in ["xla", "pallas"]:
        model, params = build(impl)
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
        t = jnp.zeros((batch,))
        f = jax.jit(lambda x: model.apply(params, x, t))
        dt = timeit(f, x)
        print(f"fwd b={batch} attn={impl}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    probes = sys.argv[1:] or ["fwd"]
    for p in probes:
        {"fwd": probe_fwd, "batch": probe_batch,
         "pallas": probe_pallas}[p]()
