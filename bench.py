"""Benchmark: samples/sec/chip at 100-step DDIM sampling on the CIFAR-10
UNet (the BASELINE.json north-star metric).

Model matches the reference's CIFAR-10 config (128 ch, mult [1,2,2,2],
attention at 16x16, 4 heads — cifar10/train_cifar10.py:92-103). The sampler
is the jitted lax.scan DDIM-100 chain; batch is sized for one v5e chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is the fraction of the chip's bf16 roofline achieved by
the sampling program (per BASELINE.md: target >= 0.95 of roofline-bound
throughput). Extra context fields are included after the required four.
"""

import json
import time

import jax
import jax.numpy as jnp

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import make_ddim_sampler

BATCH = 64
DDIM_STEPS = 100
# bf16 peak of one TPU v5e (v5litepod) chip, FLOP/s
V5E_BF16_PEAK = 394e12


def main():
    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2, in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4,
        attention_resolutions="16", dropout=0.0,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
        attention_impl="pallas")
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.zeros((BATCH,))
    params = model.init(jax.random.PRNGKey(0), x, t)

    ddpm = DDPM.create(1000)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    sampler = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=DDIM_STEPS))

    # FLOPs of one UNet forward from the compiled module, for the roofline
    fwd = jax.jit(lambda xx: model.apply(params, xx, t))
    try:
        cost = fwd.lower(x).compile().cost_analysis()
        fwd_flops = float(cost.get("flops", 0.0))
    except Exception:
        fwd_flops = 0.0

    key = jax.random.PRNGKey(1)
    xT = jax.random.normal(key, (BATCH, 32, 32, 3))

    out = sampler(key, xT)
    out.block_until_ready()  # compile + warm up

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sampler(jax.random.fold_in(key, i), xT)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    samples_per_sec = BATCH / dt
    model_flops_per_sec = fwd_flops * DDIM_STEPS / dt if fwd_flops else 0.0
    vs_baseline = model_flops_per_sec / V5E_BF16_PEAK

    print(json.dumps({
        "metric": "cifar10_ddim100_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "batch": BATCH,
        "ddim_steps": DDIM_STEPS,
        "unet_fwd_gflops": round(fwd_flops / 1e9, 2),
        "model_tflops_per_sec": round(model_flops_per_sec / 1e12, 2),
        "step_time_ms": round(dt * 1000 / DDIM_STEPS, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
