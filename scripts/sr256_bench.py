"""256x256 stretch config: sampling evidence (r4 verdict item 5).

BASELINE.json configs[4] promises "stretch attention U-Net + fused Pallas
sampler"; round 4 left only a train-step row (133.7 ms, bs 8). This script
adds the missing sampling evidence:

  1. (unless --skip_train / checkpoint exists) a few hundred training
     steps of the 256px 4x-SR CFM config via cli.train_cfm_conditional
     with periodic euler-100 evals -> PSNR trend in results_per_step.json
  2. a sampling-throughput bench of the euler-100 conditional sampler at
     256px with the flash-attention engagement ASSERTED from the
     trace-time decision log (models.unet.attn_decisions — the sp-decision
     pattern from __graft_entry__.py), not assumed from the "auto"
     heuristic

Timing: the axon backend's block_until_ready does not block (CLAUDE.md);
wall time ends with a host read of the output. Compile excluded by a
warmup chain.

Usage: python scripts/sr256_bench.py --workdir results_sr256
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def train(args) -> str:
    savedir = os.path.join(args.workdir, "superres_synthetic256")
    ckpt = os.path.join(savedir, "ckpt")
    if args.skip_train or (os.path.isdir(ckpt) and os.listdir(ckpt)):
        print(f"[sr256] reusing {savedir}", flush=True)
        return savedir
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_tpu_diffusion"))
    if "/root/.axon_site" not in env.get("PYTHONPATH", ""):
        env["PYTHONPATH"] = (REPO + ":/root/.axon_site:"
                             + env.get("PYTHONPATH", "")).rstrip(":")
    cmd = [sys.executable, "-m", "tpu_diffusion.cli.train_cfm_conditional",
           "--task", "superres", "--dataset", "synthetic256",
           "--num_steps", str(args.train_steps),
           "--batch_size", str(args.train_batch),
           "--eval_method", "euler", "--eval_batches", "1",
           "--eval_batch_size", str(args.batch),
           "--eval_every_div", "8",
           "--output_dir", args.workdir]
    print("[sr256] training:", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, env=env, check=True,
                   timeout=args.train_timeout)
    return savedir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="results_sr256")
    p.add_argument("--train_steps", type=int, default=400)
    p.add_argument("--train_batch", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ode_steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--train_timeout", type=int, default=5400)
    args = p.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    savedir = train(args)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_tpu_diffusion"))
    import jax.numpy as jnp
    import numpy as np

    from tpu_diffusion.cli.train_cfm_conditional import (
        build, make_condition_fn, make_conditional_sampler)
    from tpu_diffusion.models import unet as unet_mod
    from tpu_diffusion.train.checkpoint import CheckpointManager

    model, dim = build("superres", "synthetic256")
    h, w, c = dim
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1,)),
        jnp.zeros((1, h, w, c)), jnp.zeros((1, h // 4, w // 4, c)))
    mgr = CheckpointManager(os.path.join(savedir, "ckpt"))
    assets, step = mgr.load({"params": params, "ema": params, "step": 0})
    params = assets["ema"]
    print(f"[sr256] params from step {step}", flush=True)

    cond_fn = make_condition_fn("superres", dim, 0, -2.0)
    sampler = make_conditional_sampler(model, method="euler",
                                       num_steps=args.ode_steps)
    fast = jax.jit(lambda pr, k, cond: sampler(
        pr, k, (args.batch, h, w, c), cond))

    key = jax.random.PRNGKey(7)
    imgs = jnp.asarray(np.tanh(np.random.default_rng(0).normal(
        0, 0.6, (args.batch, h, w, c)).astype(np.float32)))
    cond = cond_fn(key, imgs)

    # engagement log fills at TRACE time: reset, trace/compile via the
    # warmup call, then read the decisions of this exact program
    unet_mod.reset_attn_decisions()
    x1, nfe = fast(params, key, cond)
    _ = float(np.asarray(x1).ravel()[0])  # host read = real completion
    decisions = unet_mod.attn_decisions()
    per_level = sorted({(d["tokens"], d["impl"]) for d in decisions},
                       reverse=True)
    flash_at = [t for (t, impl) in per_level if impl in ("pallas", "ring")]
    assert any(t >= 1024 for t in flash_at), (
        f"flash attention never engaged at T>=1024: {per_level}")

    t0 = time.monotonic()
    out = None
    for r in range(args.reps):
        key, k = jax.random.split(key)
        out, nfe = fast(params, k, cond)
    _ = float(np.asarray(out).ravel()[0])
    dt = time.monotonic() - t0
    chain_s = dt / args.reps
    result = {
        "config": "256px 4x-SR stretch (synthetic256, 6-level UNet)",
        "batch": args.batch,
        "ode_steps": args.ode_steps,
        "nfe": int(nfe),
        "reps": args.reps,
        "chain_s": round(chain_s, 3),
        "step_ms": round(1e3 * chain_s / args.ode_steps, 2),
        "samples_per_s": round(args.batch / chain_s, 3),
        "attention_per_level": [
            {"tokens": t, "impl": impl} for (t, impl) in per_level],
        "ckpt_step": int(step),
        "device": str(jax.devices()[0]),
    }
    # attach the PSNR trend from the training run's periodic evals
    trend_path = os.path.join(savedir, "results_per_step.json")
    if os.path.exists(trend_path):
        with open(trend_path) as f:
            trend = json.load(f)
        result["psnr_trend"] = [
            {"step": r["step"],
             "psnr": r["evaluation_results"].get("psnr")}
            for r in trend]
    out_path = os.path.join(args.workdir, "bench.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print("[sr256]", json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
