"""Encoder-reuse K in {2,3,4} FID gate on a trained model (r3 verdict
item 1c — re-sweep K=3/4 with the gate; the r3 run gated only K=2/4 at
one seed with low power).

Protocol (same as the r3 "Encoder-reuse decision" in PERF.md, more
seeds): train the MNIST amortized-inpainting config for --train_steps on
the chip, then run the full 1000-step conditional eval (512 test images,
testing.fid=True, random_conv features) for each (K, eval seed):
K=1 at two seeds measures the seed-to-seed noise floor; K in {2,3,4} at
two seeds each measures the reuse penalty. A K passes the gate when
|mean FID_K - mean FID_1| < the K=1 seed spread.

Usage: python scripts/reuse_gate.py --workdir /tmp/reuse_gate
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tpu_diffusion"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/reuse_gate")
    p.add_argument("--train_steps", type=int, default=800)
    p.add_argument("--num_test", type=int, default=512)
    p.add_argument("--ks", default="1,2,3,4")
    p.add_argument("--seeds", default="0,1")
    args = p.parse_args(argv)

    from tpu_diffusion.cli import main as cli_main

    base = [
        "--config", "mnist,inpainting,amortized",
        "--workdir", args.workdir,
        "--override", f"training.num_steps={args.train_steps}",
        "--override", "training.batch_size=64",
        "--override", "network.model_path=",
    ]
    os.makedirs(args.workdir, exist_ok=True)
    if not os.path.isdir(os.path.join(args.workdir, "ckpt")) or not \
            os.listdir(os.path.join(args.workdir, "ckpt")):
        # bound the train-time periodic evals (default num_test=96 at
        # 1000-step chains) — the gate only needs the checkpoint
        cli_main.main(base + [
            "--mode", "train",
            "--override", "testing.num_test=16",
            "--override", "testing.batch_size=16",
        ])

    # Each (K, seed) eval is ~5 min of chip through a tunnel that drops
    # for hours at a time: persist every row as it lands and skip combos
    # a crashed prior invocation already measured.
    rows_path = os.path.join(args.workdir, "rows.jsonl")
    rows = []
    if os.path.exists(rows_path):
        with open(rows_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        if rows:
            print(f"[reuse_gate] resuming with {len(rows)} persisted rows",
                  flush=True)
    done = {(r["K"], r["seed"]) for r in rows}
    for k in (int(v) for v in args.ks.split(",")):
        for seed in (int(v) for v in args.seeds.split(",")):
            if (k, seed) in done:
                continue
            cli_main.main(base + [
                "--mode", "eval",
                "--override", f"testing.encoder_reuse={k}",
                "--override", f"testing.seed={seed}",
                "--override", "testing.fid=true",
                "--override", f"testing.num_test={args.num_test}",
                "--override", "testing.batch_size=64",
            ])
            with open(os.path.join(args.workdir, "results.json")) as f:
                res = json.load(f)
            row = {"K": k, "seed": seed, "fid": res["fid"],
                   **{m: res.get(m) for m in
                      ("psnr_mean", "ssim_mean", "mse_mean")}}
            rows.append(row)
            with open(rows_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print("[reuse_gate]", json.dumps(row), flush=True)

    import numpy as np
    by_k = {}
    for r in rows:
        by_k.setdefault(r["K"], []).append(r["fid"])
    base_fids = by_k.get(1, [])
    noise = (abs(base_fids[0] - base_fids[1])
             if len(base_fids) >= 2 else float("nan"))
    out = {"rows": rows, "noise_floor": noise, "train_steps":
           args.train_steps, "num_test": args.num_test, "gate": {}}
    for k, fids in sorted(by_k.items()):
        if k == 1:
            continue
        delta = abs(float(np.mean(fids)) - float(np.mean(base_fids)))
        out["gate"][str(k)] = {"mean_fid": round(float(np.mean(fids)), 4),
                               "delta_vs_k1": round(delta, 4),
                               "passes": bool(delta < noise)}
    path = os.path.join(args.workdir, "reuse_gate.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("[reuse_gate] summary", json.dumps(out["gate"]), "noise",
          round(noise, 4), flush=True)


if __name__ == "__main__":
    main()
