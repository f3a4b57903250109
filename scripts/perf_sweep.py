"""Perf sweep for the DDIM-100 bench: batch size x dtype variants.

Run on the real TPU. Prints one JSON line per config.
"""
import json
import time

import jax
import jax.numpy as jnp

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import make_ddim_sampler

V5E_BF16_PEAK = 394e12
DDIM_STEPS = 100
# cost_analysis()-measured at batch 64 (746.98 GFLOP); scales linearly.
FWD_GFLOPS_PER_SAMPLE = 746.98 / 64


def run(batch, attention_impl, norm_dtype, cast_params, n_iters=3,
        norm_impl="xla"):
    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2, in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4,
        attention_resolutions="16", dropout=0.0,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
        norm_dtype=norm_dtype, attention_impl=attention_impl,
        norm_impl=norm_impl)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    t = jnp.zeros((batch,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    if cast_params:
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)

    ddpm = DDPM.create(1000)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    sampler = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=DDIM_STEPS))
    fwd_flops = FWD_GFLOPS_PER_SAMPLE * 1e9 * batch

    key = jax.random.PRNGKey(1)
    xT = jax.random.normal(key, (batch, 32, 32, 3))
    out = sampler(key, xT)
    out.block_until_ready()

    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sampler(jax.random.fold_in(key, i), xT)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    mfu = fwd_flops * DDIM_STEPS / dt / V5E_BF16_PEAK if fwd_flops else 0.0
    print(json.dumps({
        "batch": batch, "attn": attention_impl,
        "norm_dtype": str(norm_dtype), "bf16_params": cast_params,
        "norm_impl": norm_impl,
        "samples_per_sec": round(batch / dt, 2),
        "step_ms": round(dt * 1000 / DDIM_STEPS, 3),
        "mfu": round(mfu, 4),
        "fwd_gflops": round(fwd_flops / 1e9, 2),
    }), flush=True)


if __name__ == "__main__":
    import sys
    configs = [
        # 0: baseline (current bench config)
        dict(batch=64, attention_impl="pallas", norm_dtype=None,
             cast_params=False),
        # 1-3: batch scaling (measured: hurts — bandwidth-bound)
        dict(batch=128, attention_impl="pallas", norm_dtype=None,
             cast_params=False),
        dict(batch=256, attention_impl="pallas", norm_dtype=None,
             cast_params=False),
        dict(batch=512, attention_impl="pallas", norm_dtype=None,
             cast_params=False),
        # 4: bf16 norm compute + bf16 params
        dict(batch=64, attention_impl="pallas", norm_dtype=jnp.bfloat16,
             cast_params=True),
        # 5: same but XLA attention
        dict(batch=64, attention_impl="xla", norm_dtype=jnp.bfloat16,
             cast_params=True),
        # 6: bf16 params only (isolate the norm effect)
        dict(batch=64, attention_impl="pallas", norm_dtype=None,
             cast_params=True),
        # 7: smaller batch
        dict(batch=32, attention_impl="pallas", norm_dtype=jnp.bfloat16,
             cast_params=True),
        # 8: fused Pallas GroupNorm+FiLM+SiLU
        dict(batch=64, attention_impl="xla", norm_dtype=None,
             cast_params=True, norm_impl="fused"),
        # 9: fused norms + pallas attention
        dict(batch=64, attention_impl="pallas", norm_dtype=None,
             cast_params=True, norm_impl="fused"),
        # 10: fused norms, larger batch
        dict(batch=128, attention_impl="xla", norm_dtype=None,
             cast_params=True, norm_impl="fused"),
    ]
    sel = [int(a) for a in sys.argv[1:]] or range(len(configs))
    for i in sel:
        run(**configs[i])
