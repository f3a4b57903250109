"""Benchmark: samples/sec/chip at 100-step DDIM sampling on the CIFAR-10
UNet (the BASELINE.json north-star metric).

Model matches the reference's CIFAR-10 config (128 ch, mult [1,2,2,2],
attention at 16x16, 4 heads — cifar10/train_cifar10.py:92-103). The sampler
is the jitted lax.scan DDIM-100 chain; config is the fastest measured on a
v5e (PERF.md sweep): batch 64, XLA attention at T=256, bf16 norm compute
with fp32 statistics, bf16 weights.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is the fraction of the chip's ROOFLINE-bound step time
achieved, with the roofline the standard bandwidth-aware one:

    T_roofline = max(total_flops / peak_bf16_flops,
                     total_hbm_bytes / peak_hbm_bw)
    vs_baseline = T_roofline / T_measured

(the UNet at 32x32 is memory-bound: its compiled HLO moves ~7.4 bytes/flop
/ 481 needed for MXU saturation, so a pure-compute "fraction of peak FLOPs"
denominator is unreachable by ANY implementation of this workload — see
PERF.md for the measured per-op breakdown. Raw MFU is still reported as
`mfu`.) FLOPs and bytes come from the compiled sampler's own cost analysis.
"""

import json
import os
import time

import jax

# Persistent compilation cache: the two sampler compiles cost ~10 min cold
# on the axon tunnel; with the cache a fresh process reuses them.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tpu_diffusion"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import make_ddim_sampler

BATCH = 64
DDIM_STEPS = 100
# one TPU v5e (v5litepod) chip: bf16 peak FLOP/s and HBM bandwidth
V5E_BF16_PEAK = 394e12
V5E_HBM_BW = 819e9


def main():
    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2, in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4,
        attention_resolutions="16", dropout=0.0,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
        norm_dtype=jnp.bfloat16, attention_impl="xla")
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.zeros((BATCH,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)

    ddpm = DDPM.create(1000)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    sampler = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=DDIM_STEPS))

    key = jax.random.PRNGKey(1)
    xT = jax.random.normal(key, (BATCH, 32, 32, 3))

    compiled = sampler.lower(key, xT).compile()
    # flops / bytes of ONE DDIM step (XLA cost analysis counts a while-loop
    # body once, so cost a 1-step sampler explicitly), scaled by the step
    # count for the program roofline.
    one_step = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=1))
    try:
        cost = one_step.lower(key, xT).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
        step_bytes = float(cost.get("bytes accessed", 0.0))
    except Exception:
        step_flops = step_bytes = 0.0
    total_flops = step_flops * DDIM_STEPS
    total_bytes = step_bytes * DDIM_STEPS

    out = compiled(key, xT)
    out.block_until_ready()  # warm up

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = compiled(jax.random.fold_in(key, i), xT)
    # A blocking host read, not just block_until_ready: on the axon backend
    # block_until_ready returns before remote completion (measured in
    # PERF.md); the scalar read costs ~28 ms fixed (<1% of the loop).
    import numpy as np
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / n_iters

    samples_per_sec = BATCH / dt
    mfu = total_flops / dt / V5E_BF16_PEAK if total_flops else 0.0
    t_roofline = max(total_flops / V5E_BF16_PEAK,
                     total_bytes / V5E_HBM_BW)
    # cost_analysis "bytes accessed" is an UPPER bound on true HBM traffic
    # (it counts logical accesses; fusion only removes physical ones), so
    # the ratio can exceed 1 when the program outruns the estimate — report
    # it saturated at 1.0 (= at the achievable-bandwidth limit) and keep
    # the raw ratio for the record.
    ratio = t_roofline / dt if t_roofline else 0.0
    vs_baseline = min(1.0, ratio)

    print(json.dumps({
        "metric": "cifar10_ddim100_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "batch": BATCH,
        "ddim_steps": DDIM_STEPS,
        "mfu": round(mfu, 4),
        "roofline_ratio_raw": round(ratio, 4),
        "program_gflops": round(total_flops / 1e9, 2),
        "program_hbm_gb": round(total_bytes / 1e9, 3),
        "roofline_ms": round(t_roofline * 1e3, 3),
        "measured_ms": round(dt * 1e3, 3),
        "step_time_ms": round(dt * 1000 / DDIM_STEPS, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
