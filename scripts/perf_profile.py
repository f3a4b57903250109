"""Capture a jax.profiler trace of the DDIM-100 bench program and print a
per-op-category time breakdown (conv / norm / attention / elementwise / RNG /
other), for PERF.md.

Usage: python scripts/perf_profile.py [batch] [attn_impl] [norm_dtype]
"""
import collections
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp

from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import make_ddim_sampler

TRACE_DIR = "/tmp/ddim_trace"


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv"
    if "flash" in n or "attn" in n or "attention" in n or "pallas" in n:
        return "attention"
    if "reduce" in n and ("norm" in n or "variance" in n or "mean" in n):
        return "norm"
    if "dot" in n or "einsum" in n or "gemm" in n:
        return "matmul"
    if "rng" in n or "threefry" in n or "random" in n:
        return "rng"
    if any(k in n for k in ("fusion", "add", "multiply", "subtract",
                            "divide", "tanh", "exp", "log",
                            "maximum", "minimum", "select", "clamp")):
        return "fusion/elementwise"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "copy/layout"
    return "other"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    attn = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    norm = (None if len(sys.argv) <= 3 or sys.argv[3] == "fp32"
            else jnp.bfloat16)
    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2, in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4,
        attention_resolutions="16", dropout=0.0,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
        norm_dtype=norm, attention_impl=attn)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    t = jnp.zeros((batch,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    ddpm = DDPM.create(1000)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    sampler = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=100))
    key = jax.random.PRNGKey(1)
    xT = jax.random.normal(key, (batch, 32, 32, 3))
    sampler(key, xT).block_until_ready()

    with jax.profiler.trace(TRACE_DIR):
        out = sampler(key, xT)
        out.block_until_ready()

    # aggregate device-side op durations from the chrome trace
    time.sleep(1)
    paths = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        print("no trace.json.gz found under", TRACE_DIR)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid names containing "TPU" / "/device"
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "XLA Ops" in n}
    cat_tot = collections.Counter()
    op_tot = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e6  # us -> s
        if not dur:
            continue
        cat_tot[categorize(name)] += dur
        op_tot[name] += dur
        total += dur
    print(json.dumps({"batch": batch, "attn": attn,
                      "norm": "bf16" if norm else "fp32",
                      "device_total_s": round(total, 4)}))
    for cat, s in cat_tot.most_common():
        print(f"  {cat:20s} {s:8.4f}s  {100*s/total:5.1f}%")
    print("top ops:")
    for name, s in op_tot.most_common(25):
        print(f"  {100*s/total:5.1f}%  {s:8.4f}s  {name[:100]}")


if __name__ == "__main__":
    main()
