"""Round-2 perf ablations for the DDIM-100 bench (VERDICT item 2).

Measures, on the real TPU, where the 70% roofline gap comes from:
param dtype (fp32 weights re-cast inside the scan every step), norm dtype
(fp32 GroupNorm islands), attention impl/share, and batch size.

Usage: python scripts/perf_probe2.py            # all ablations
Prints one line per variant: ms/step, samples/s, and MFU vs the v5e peak.
"""

import time

import jax
import jax.numpy as jnp

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import make_ddim_sampler

PEAK = 394e12
KEY = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def build(attn="pallas", norm_dtype=None, attn_res="16"):
    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2, in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4,
        attention_resolutions=attn_res, use_scale_shift_norm=True,
        dtype=jnp.bfloat16, norm_dtype=norm_dtype, attention_impl=attn)
    params = model.init(KEY, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    return model, params


def cast_bf16(params):
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)


def run(name, model, params, batch=64, iters=3):
    ddpm = DDPM.create(1000)

    def eps(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    sampler = jax.jit(make_ddim_sampler(eps, ddpm, num_steps=100))
    xT = jax.random.normal(KEY, (batch, 32, 32, 3))
    dt = timeit(sampler, KEY, xT, iters=iters)
    t = jnp.zeros((batch,))
    fwd = jax.jit(lambda xx: model.apply(params, xx, t))
    try:
        flops = float(fwd.lower(xT).compile().cost_analysis().get("flops", 0))
    except Exception:
        flops = 0.0
    mfu = flops * 100 / dt / PEAK if flops else 0.0
    print(f"{name:44s} b={batch:3d}  {dt*1e3/100:7.3f} ms/step  "
          f"{batch/dt:8.1f} samples/s  MFU={mfu:.3f}", flush=True)
    return dt


def main():
    # A: round-1 baseline (fp32 params, fp32 norms, pallas attn, b=64)
    model, params = build()
    run("A baseline fp32-params fp32-norm", model, params)

    # B: pre-cast params to bf16
    pb = cast_bf16(params)
    run("B bf16-params", model, pb)

    # C: B + bf16 norms (fp32 stats inside flax)
    model_c, params_c = build(norm_dtype=jnp.bfloat16)
    run("C bf16-params bf16-norm", model_c, cast_bf16(params_c))

    # D: C without attention (attention share under C)
    model_d, params_d = build(norm_dtype=jnp.bfloat16, attn_res="")
    run("D C-no-attention", model_d, cast_bf16(params_d))

    # E: C with xla attention
    model_e, params_e = build(attn="xla", norm_dtype=jnp.bfloat16)
    run("E C-xla-attention", model_e, cast_bf16(params_e))

    # F/G: batch sweep under C
    run("F C b=128", model_c, cast_bf16(params_c), batch=128)
    run("G C b=256", model_c, cast_bf16(params_c), batch=256)

    # H: pure-conv MFU ceiling probe: conv-only resnet at bench shapes
    from flax import linen as nn

    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(128, (3, 3), padding="SAME", dtype=jnp.bfloat16)(
                x.astype(jnp.bfloat16))
            for _ in range(20):
                h = h + nn.Conv(128, (3, 3), padding="SAME",
                                dtype=jnp.bfloat16)(nn.silu(h))
            return h

    cs = ConvStack()
    cp = cast_bf16(cs.init(KEY, jnp.zeros((1, 32, 32, 3))))
    x = jax.random.normal(KEY, (64, 32, 32, 3))
    f = jax.jit(lambda xx: cs.apply(cp, xx))
    dt = timeit(f, x, iters=10)
    flops = float(f.lower(x).compile().cost_analysis().get("flops", 0))
    print(f"{'H conv-only ceiling (21 convs, 128ch, 32px)':44s} b= 64  "
          f"{dt*1e3:7.3f} ms/fwd  MFU={flops/dt/PEAK:.3f}", flush=True)
    for b in (256, 1024):
        xb = jax.random.normal(KEY, (b, 32, 32, 3))
        dtb = timeit(f, xb, iters=10)
        flopsb = float(f.lower(xb).compile().cost_analysis().get("flops", 0))
        print(f"{'H conv-only ceiling':44s} b={b:4d} {dtb*1e3:7.3f} ms/fwd  "
              f"MFU={flopsb/dtb/PEAK:.3f}", flush=True)


if __name__ == "__main__":
    main()
