"""Reference FID protocol at reference scale (r3 verdict item 2).

Runs `cli/compute_fid.py` exactly as the reference does —
50,000 generated images at batch 1024 (`cifar10/compute_fid.py:28-31,
92-100`) — against a trained long-horizon checkpoint, for both the
euler-100 fixed grid and the calibrated dopri5 adaptive integrator,
recording wall-clock and compiled peak memory per run.

Each integrator runs in its OWN subprocess: the first in-process run
showed the second method's executable crashing the TPU worker after the
first one had already pinned ~3.7 GB of HBM, and a worker crash poisons
the whole JAX client anyway. Per-method results persist to
`fid50k_<method>.json` so a retried invocation skips finished methods,
and a `fid_random_conv.json` left behind by a crashed prior invocation
is adopted when its method/num_gen match.

Usage (after scripts/long_horizon.py has produced a checkpoint):
  python scripts/export_for_fid.py --src results_long_horizon \
      --dst results_fid50k --model otcfm
  python scripts/fid50k.py --input_dir results_fid50k
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def method_result_path(input_dir: str, method: str) -> str:
    return os.path.join(input_dir, f"fid50k_{method}.json")


def adopt_from_disk(args, method: str):
    """A prior invocation that crashed on a LATER method leaves this
    method's compute_fid output behind — reuse it instead of paying the
    ~23 min of generation again (wall clock unknown → null)."""
    path = os.path.join(args.input_dir, args.model, "fid_random_conv.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        res = json.load(f)
    if res.get("method") != method:
        return None
    if res.get("num_gen", 0) < args.num_gen:
        return None
    return {**res, "wall_clock_s": None,
            "batch_size_fid": args.batch_size_fid,
            "note": "adopted from a prior invocation's on-disk result"}


def run_method(args, method: str):
    cmd = [sys.executable, "-m", "tpu_diffusion.cli.compute_fid",
           "--model", args.model,
           "--input_dir", args.input_dir,
           "--integration_method", method,
           "--integration_steps", "100",
           "--num_gen", str(args.num_gen),
           "--batch_size_fid", str(args.batch_size_fid),
           "--use_ema", args.use_ema]
    env = dict(os.environ)
    # The in-process predecessor set these via jax.config; a subprocess
    # needs them in the environment or every retry pays a fresh ~minutes
    # TPU compile.
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_tpu_diffusion"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    if "/root/.axon_site" not in env.get("PYTHONPATH", ""):
        env["PYTHONPATH"] = (REPO + ":/root/.axon_site:"
                             + env.get("PYTHONPATH", "")).rstrip(":")
    t0 = time.monotonic()
    proc = subprocess.run(cmd, cwd=REPO, env=env)
    wall = time.monotonic() - t0
    if proc.returncode != 0:
        return {"method": method, "error": f"rc={proc.returncode}",
                "wall_clock_s": round(wall, 1)}
    with open(os.path.join(args.input_dir, args.model,
                           "fid_random_conv.json")) as f:
        res = json.load(f)
    return {**res, "wall_clock_s": round(wall, 1),
            "batch_size_fid": args.batch_size_fid}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", default="results_fid50k")
    p.add_argument("--model", default="otcfm")
    p.add_argument("--num_gen", type=int, default=50000)
    p.add_argument("--batch_size_fid", type=int, default=1024)
    p.add_argument("--methods", default="euler,dopri5")
    p.add_argument("--use_ema", default="true")
    args = p.parse_args(argv)

    rows = []
    for method in args.methods.split(","):
        persisted = method_result_path(args.input_dir, method)
        if os.path.exists(persisted):
            with open(persisted) as f:
                row = json.load(f)
            print(f"[fid50k] {method}: reusing {persisted}", flush=True)
        else:
            row = adopt_from_disk(args, method) or run_method(args, method)
            if "error" not in row:
                with open(persisted, "w") as f:
                    json.dump(row, f, indent=2)
        rows.append(row)
        print("[fid50k]", json.dumps(
            {k: row.get(k) for k in ("method", "fid", "num_gen", "mean_nfe",
                                     "wall_clock_s", "error") if k in row}),
            flush=True)

    ok = [r for r in rows if "error" not in r]
    if not ok:
        print("[fid50k] every method failed; not writing fid50k.json",
              flush=True)
        sys.exit(1)
    out = os.path.join(args.input_dir, "fid50k.json")
    with open(out, "w") as f:
        json.dump({"runs": rows}, f, indent=2)
    print(f"[fid50k] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
