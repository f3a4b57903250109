"""Dual-stream DDIM probe: can interleaving independent chains in one scan
body fill the scheduler bubbles the roofline accounting left unattributed?

PERF.md round 4's traffic accounting pins ~88% of the measured HBM traffic
to irreducible categories; the residual gap between the measured 5.1 ms/step
and the realistic 3.4-3.7 ms bound lives in Mosaic/XLA *scheduling*, not
traffic. One DDIM chain is strictly sequential (step n+1 needs step n), so
dependency stalls inside a step cannot be hidden by more batch (r3 sweep:
batch 128 is slower per sample than 64). Two INDEPENDENT chains in one scan
body, however, give the scheduler two disjoint op DAGs to interleave: one
stream's convs can execute while the other's layout/norm chains wait.

Measures samples/s (plain DDIM-100, bf16, K=1) for:
  A. 1 stream x batch 64   (the bench baseline shape)
  B. 2 streams x batch 32  (same total work per step)
  C. 2 streams x batch 64  (more work in flight)

A win on B (same arithmetic, better overlap) or C (throughput despite the
r3 batch-128 regression) justifies a dual-stream bench mode; a loss closes
this lever the same way the two Pallas attempts closed kernel granularity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tpu_diffusion"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import (_ddim_per_step, _ddim_update,
                                              make_ddim_sampler, process_x0)

def make_multi_stream_sampler(eps_fn, ddpm, n_streams: int, steps: int):
    """`n_streams` independent DDIM chains advanced inside ONE scan body."""
    per_step = _ddim_per_step(ddpm, steps, 0.0)

    def sample(key, xTs):            # xTs: tuple of [B, H, W, C]
        def body(carry, row):
            xs, k = carry
            new = []
            for x in xs:
                ib = jnp.full((x.shape[0],), row[0].astype(jnp.int32))
                eps = eps_fn(x, ib)
                xn, k = _ddim_update(x, eps, row, k, 0.0)
                new.append(xn)
            return (tuple(new), k), None

        (xs, _), _ = jax.lax.scan(body, (tuple(xTs), key), per_step)
        return tuple(process_x0(x) for x in xs)

    return sample


def time_it(fn, args, label, iters=5):
    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    _ = float(np.asarray(first).ravel()[0])     # blocking warm-up read
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.fold_in(args[0], i), *args[1:])
    first = out[0] if isinstance(out, tuple) else out
    _ = float(np.asarray(first).ravel()[0])     # axon: only a host read blocks
    dt = (time.perf_counter() - t0) / iters
    return dt


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=64,
                   help="per-stream batch for variant A/C; B uses half")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU correctness pass (forces cpu platform)")
    args = p.parse_args(argv)
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.channels, args.steps, args.batch = 16, 4, 4
    STEPS = args.steps
    B = args.batch

    model = create_model(
        image_size=32, num_channels=args.channels, num_res_blocks=2,
        in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4, attention_resolutions="16",
        dropout=0.0, use_scale_shift_norm=True, dtype=jnp.bfloat16,
        norm_dtype=jnp.bfloat16, attention_impl="xla")
    x0 = jnp.zeros((B, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,)))
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    ddpm = DDPM.create(1000)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    key = jax.random.PRNGKey(1)
    results = []
    for label, n_streams, b in [(f"A_1x{B}", 1, B),
                                (f"B_2x{B // 2}", 2, B // 2),
                                (f"C_2x{B}", 2, B)]:
        if n_streams == 1:
            fn = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=STEPS))
            fargs = (key, jax.random.normal(key, (b, 32, 32, 3)))
        else:
            raw = make_multi_stream_sampler(eps_fn, ddpm, n_streams, STEPS)
            fn = jax.jit(lambda k, *xs: raw(k, xs))
            fargs = (key,) + tuple(
                jax.random.normal(jax.random.fold_in(key, s),
                                  (b, 32, 32, 3))
                for s in range(n_streams))
        t_c0 = time.perf_counter()
        dt = time_it(fn, fargs, label)
        total = n_streams * b
        row = {"variant": label, "streams": n_streams, "batch_each": b,
               "ms_per_chain": round(dt * 1e3, 1),
               "samples_per_sec": round(total / dt, 2),
               "compile_plus_first_s": round(time.perf_counter() - t_c0, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]["samples_per_sec"]
    for r in results[1:]:
        print(f"{r['variant']}: {r['samples_per_sec'] / base:.3f}x vs A",
              flush=True)


if __name__ == "__main__":
    main()
