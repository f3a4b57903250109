"""Reference FID protocol at reference scale (r3 verdict item 2).

Runs `cli/compute_fid.py` exactly as the reference does —
50,000 generated images at batch 1024 (`cifar10/compute_fid.py:28-31,
92-100`) — against a trained long-horizon checkpoint, for both the
euler-100 fixed grid and the calibrated dopri5 adaptive integrator,
recording wall-clock and peak device memory per run.

Usage (after scripts/long_horizon.py has produced a checkpoint):
  python scripts/export_for_fid.py --src results_long_horizon \
      --dst results_fid50k --model otcfm
  python scripts/fid50k.py --input_dir results_fid50k
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tpu_diffusion"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def peak_memory_gb() -> float | None:
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        return round(peak / 1e9, 3) if peak else None
    except Exception:
        return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", default="results_fid50k")
    p.add_argument("--model", default="otcfm")
    p.add_argument("--num_gen", type=int, default=50000)
    p.add_argument("--batch_size_fid", type=int, default=1024)
    p.add_argument("--methods", default="euler,dopri5")
    p.add_argument("--use_ema", default="true")
    args = p.parse_args(argv)

    from tpu_diffusion.cli import compute_fid

    rows = []
    for method in args.methods.split(","):
        t0 = time.monotonic()
        compute_fid.main([
            "--model", args.model,
            "--input_dir", args.input_dir,
            "--integration_method", method,
            "--integration_steps", "100",
            "--num_gen", str(args.num_gen),
            "--batch_size_fid", str(args.batch_size_fid),
            "--use_ema", args.use_ema,
        ])
        wall = time.monotonic() - t0
        with open(os.path.join(args.input_dir, args.model,
                               "fid_random_conv.json")) as f:
            res = json.load(f)
        row = {**res, "wall_clock_s": round(wall, 1),
               "peak_device_memory_gb": peak_memory_gb(),
               "batch_size_fid": args.batch_size_fid}
        rows.append(row)
        print("[fid50k]", json.dumps(
            {k: row[k] for k in ("method", "fid", "num_gen", "mean_nfe",
                                 "wall_clock_s", "peak_device_memory_gb")}),
            flush=True)

    out = os.path.join(args.input_dir, "fid50k.json")
    with open(out, "w") as f:
        json.dump({"runs": rows}, f, indent=2)
    print(f"[fid50k] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
