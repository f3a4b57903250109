"""FID evaluation of a trained CFM model.

Rebuilds `cifar10/compute_fid.py` == `mnist/compute_fid.py`:

    python -m tpu_diffusion.cli.compute_fid --model otcfm \
        --input_dir results --integration_method dopri5 --num_gen 50000

Protocol (compute_fid.py:28-31, 73-100): load the EMA params from the
newest checkpoint, integrate the velocity field from noise (dopri5
atol=rtol=1e-5, or fixed-step euler with --integration_steps), quantize to
uint8 range, and compute the Frechet distance against the dataset train
split. Generation is batched (default 1024) and jitted; with multiple chips
the batch shards over the mesh data axis.

Feature extractor: --features {random_conv, inception}. See
tpu_diffusion/eval/fid.py for comparability caveats.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.cli.train_cifar10 import build_model
from tpu_diffusion.data.registry import epoch_batches, get_dataset
from tpu_diffusion.eval.fid import FID, make_feature_fn
from tpu_diffusion.sampling.ode import odeint
from tpu_diffusion.train.checkpoint import CheckpointManager


def quantize_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> uint8 -> [-1,1] float (the reference quantizes
    generated images to uint8 before FID, compute_fid.py:88-91)."""
    u8 = jnp.clip((x + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
    return u8.astype(jnp.float32) / 127.5 - 1.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="otcfm")
    p.add_argument("--input_dir", default="results")
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--num_channel", type=int, default=128)
    p.add_argument("--integration_method", default="dopri5",
                   choices=["dopri5", "euler", "heun", "midpoint", "rk4"])
    p.add_argument("--integration_steps", type=int, default=100)
    p.add_argument("--tol", type=float, default=1e-5)
    p.add_argument("--num_gen", type=int, default=50000)
    p.add_argument("--batch_size_fid", type=int, default=1024)
    p.add_argument("--features", default="random_conv",
                   choices=["random_conv", "inception"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dopri5_fixed_trip", default="auto",
                   choices=["auto", "true", "false"],
                   help="force the fixed-trip-count masked-scan dopri5 "
                        "(auto: platform-appropriate — fixed on TPU, "
                        "early-exit while_loop elsewhere)")
    p.add_argument("--dopri5_chunk", type=int, default=16,
                   help="trips per device execution for the TPU fixed-trip "
                        "dopri5 (the axon tunnel kills single executions "
                        "that run for minutes; 16 trips = 96 NFE keeps "
                        "each execution at the proven euler-100 scale)")
    p.add_argument("--use_ema", default="true", choices=["true", "false"],
                   help="sample with the EMA weights (reference protocol); "
                        "'false' uses the live params (useful for short "
                        "runs where the 0.9999 EMA has not converged)")
    p.add_argument("--data_root", default="data")
    args = p.parse_args(argv)

    ds = get_dataset(args.dataset)(args.data_root, train=True)
    h, w, c = ds.shape
    model = build_model(image_size=h, num_channels=args.num_channel,
                        channels=c)

    ckpt_dir = os.path.join(args.input_dir, args.model, "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    x0 = jnp.zeros((1, h, w, c))
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1,)), x0)
    assets, step = mgr.load({"params": params0, "ema": params0, "step": 0})
    params = assets["ema" if args.use_ema == "true" else "params"]
    print(f"[compute_fid] restored step {step} from {ckpt_dir}",
          flush=True)

    def velocity(t, x):
        return model.apply(params, t, x)

    dopri5_kwargs = {}
    if args.integration_method == "dopri5":
        from tpu_diffusion.sampling.ode import (calibrate_dopri5_steps,
                                                dopri5_platform_kwargs)
        if args.dopri5_fixed_trip == "auto":
            dopri5_kwargs = dopri5_platform_kwargs()
        elif args.dopri5_fixed_trip == "true":
            dopri5_kwargs = {"fixed_trip_count": True, "max_steps": 128}
        else:
            dopri5_kwargs = {}
            if jax.default_backend() not in ("cpu", "gpu"):
                print("[compute_fid] WARNING: --dopri5_fixed_trip false "
                      "selects the dynamic lax.while_loop integrator, "
                      "which HANGS on the axon TPU backend (CLAUDE.md); "
                      "use 'auto' or 'true' on this platform.",
                      flush=True)
        if dopri5_kwargs.get("fixed_trip_count"):
            # TPU pays all 6*max_steps NFE of the masked scan — size the
            # budget from one CPU probe of the real controller instead of
            # the conservative 128-trip default.
            cpu = jax.devices("cpu")[0]
            cpu_params = jax.device_put(params, cpu)
            probe = jax.device_put(jax.random.normal(
                jax.random.PRNGKey(args.seed + 1), (2, h, w, c)), cpu)
            dopri5_kwargs["max_steps"] = calibrate_dopri5_steps(
                lambda t, x: model.apply(cpu_params, t, x), probe,
                rtol=args.tol, atol=args.tol)
            print(f"[compute_fid] dopri5 trip budget calibrated to "
                  f"{dopri5_kwargs['max_steps']} (CPU probe)")

    compiled_mem_gb = None
    if dopri5_kwargs.get("fixed_trip_count"):
        # Fixed-trip dopri5 on the tunnel backend: the whole calibrated
        # budget in one executable (~6*budget NFE) runs for minutes at
        # batch 1024 and gets the worker killed (measured round 4);
        # Dopri5Chunked splits the masked scan into euler-scale
        # executions with identical numerics.
        from tpu_diffusion.sampling.ode import Dopri5Chunked
        chunked = Dopri5Chunked(velocity, rtol=args.tol, atol=args.tol,
                                max_steps=dopri5_kwargs["max_steps"],
                                chunk_steps=args.dopri5_chunk)
        noise_fn = jax.jit(lambda k: jax.random.normal(
            k, (args.batch_size_fid, h, w, c)))
        post_fn = jax.jit(lambda x: quantize_roundtrip(jnp.clip(x, -1, 1)))

        def gen_batch(key):
            x1, nfe = chunked(noise_fn(key))
            return post_fn(x1), nfe

        try:
            compiled_mem_gb = chunked.memory_analysis_gb(
                jax.ShapeDtypeStruct((args.batch_size_fid, h, w, c),
                                     jnp.float32))
            print(f"[compute_fid] compiled memory analysis (per segment): "
                  f"{compiled_mem_gb} GB (temp+args+out); "
                  f"{chunked.n_segments} segments x {chunked.chunk_steps} "
                  f"trips per batch", flush=True)
        except Exception:
            pass
    else:
        def _gen_batch(key):
            noise = jax.random.normal(key, (args.batch_size_fid, h, w, c))
            if args.integration_method == "dopri5":
                x1, nfe = odeint(velocity, noise, method="dopri5",
                                 rtol=args.tol, atol=args.tol,
                                 **dopri5_kwargs)
            else:
                x1, nfe = odeint(velocity, noise,
                                 method=args.integration_method,
                                 num_steps=args.integration_steps)
            return quantize_roundtrip(jnp.clip(x1, -1, 1)), nfe

        # AOT-compile once so the compiler's memory analysis (peak temp +
        # argument + output bytes) can be reported even on backends whose
        # runtime doesn't expose memory_stats().
        gen_batch = jax.jit(_gen_batch).lower(
            jax.random.PRNGKey(0)).compile()
        try:
            ma = gen_batch.memory_analysis()
            compiled_mem_gb = round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes) / 1e9, 3)
            print(f"[compute_fid] compiled memory analysis: "
                  f"{compiled_mem_gb} GB (temp+args+out)", flush=True)
        except Exception:
            pass

    feature_fn = make_feature_fn(args.features, image_size=h, channels=c)
    fid = FID(feature_fn)
    # Real-split statistics are a pure function of (dataset, features,
    # shape); cache them on disk — the transfer of the full train split
    # through the TPU tunnel dominates startup otherwise (~15 min for
    # CIFAR-10 at tunnel bandwidth, measured round 4).
    stats_path = os.path.join(
        args.input_dir,
        f"real_stats_{args.dataset}_{args.features}_{h}x{w}x{c}.npz")
    if os.path.exists(stats_path):
        z = np.load(stats_path)
        fid.set_real_statistics(z["mu"], z["sigma"])
        print(f"[compute_fid] real stats from cache {stats_path}",
              flush=True)
    else:
        for batch in epoch_batches(ds, args.batch_size_fid):
            fid.update(jnp.asarray(batch), real=True)
        mu, sigma = fid.real_statistics()
        np.savez(stats_path, mu=mu, sigma=sigma)

    key = jax.random.PRNGKey(args.seed)
    total_nfe = 0
    n_batches = -(-args.num_gen // args.batch_size_fid)
    for i in range(n_batches):
        key, k = jax.random.split(key)
        imgs, nfe = gen_batch(k)
        total_nfe += int(nfe)
        if args.integration_method == "dopri5" and dopri5_kwargs.get(
                "max_steps"):
            from tpu_diffusion.sampling.ode import dopri5_truncated
            if dopri5_truncated(nfe, dopri5_kwargs["max_steps"]):
                print(f"[compute_fid] WARNING: dopri5 exhausted its "
                      f"{dopri5_kwargs['max_steps']}-trip budget (nfe="
                      f"{int(nfe)}) — trajectory may be unconverged; "
                      f"raise the budget/margin")
        fid.update(imgs, real=False)
        if i % 5 == 0:
            print(f"[compute_fid] generated {min((i+1)*args.batch_size_fid, args.num_gen)}"
                  f"/{args.num_gen}", flush=True)

    score = fid.compute()
    result = {"fid": score, "features": args.features, "step": int(step),
              "num_gen": n_batches * args.batch_size_fid,
              "mean_nfe": total_nfe / n_batches,
              "method": args.integration_method,
              "compiled_memory_gb": compiled_mem_gb}
    if dopri5_kwargs.get("fixed_trip_count"):
        result["dopri5_trip_budget"] = dopri5_kwargs["max_steps"]
        result["dopri5_chunk"] = args.dopri5_chunk
    from tpu_diffusion.eval.fid import fid_caveat
    result.update(fid_caveat(args.features,
                             synthetic_data=getattr(ds, "synthetic", False)))
    print(json.dumps(result))
    out = os.path.join(args.input_dir, args.model,
                       f"fid_{args.features}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
