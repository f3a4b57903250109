"""Conditioning-mechanism comparison — the reference's scientific core
(r4 verdict item 3), run as a real experiment for the first time.

The reference's experiments apparatus exists to compare Amortized vs
ReconstructionGuidance vs Replacement on the same task (`amortised
diffusion/image_diffusion/sampling.py:137-260`, sweep grids
`experiments/schedule.sh`, CI aggregation `experiments/read_results.py:
14-35`). Protocol here, mirroring the reference's shared-weights scheme
(`experiments/config.py:7-35`: one unconditional checkpoint serves every
recon-guidance/replacement cell; the amortized cell has its own):

  1. train an UNCONDITIONAL MNIST DDPM (conditioning=recon_guidance
     trains the plain eps-matching loss, losses/ddpm.py:get_loss_function)
  2. train the AMORTIZED inpainting model (condition-dropout loss)
  3. generate the eval grid with cli.sweep.CommandsBuilder
     (create_commands.py parity) -> commands_eval.txt
  4. run every cell: `cli.main --mode eval` warm-started from the right
     checkpoint via network.model_path, 96 test images through the full
     1000-step conditional sampler per cell (reference num_test, config
     .py:186-192) -> MSE/PSNR/SSIM/LPIPS in the cell's results.json
  5. aggregate with cli.sweep collect_results/aggregate (t-CIs over eval
     seeds) -> aggregated.csv + summary.md

Each cell runs in its own subprocess (a TPU worker crash poisons the
JAX client) into a deterministic per-cell workdir, so a retried
invocation skips finished cells.

Usage: python scripts/conditioning_sweep.py --workdir results_conditioning_sweep
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shlex
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cell_env():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_tpu_diffusion"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    if "/root/.axon_site" not in env.get("PYTHONPATH", ""):
        env["PYTHONPATH"] = (REPO + ":/root/.axon_site:"
                             + env.get("PYTHONPATH", "")).rstrip(":")
    return env


def train_ckpt(spec: str, workdir: str, steps: int, timeout: int,
               extra: list):
    """Train a checkpoint for the sweep unless one already exists."""
    ckpt_dir = os.path.join(workdir, "ckpt")
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        print(f"[cond_sweep] reusing checkpoint {ckpt_dir}", flush=True)
        return
    cmd = [sys.executable, "-m", "tpu_diffusion.cli.main",
           "--config", spec, "--mode", "train", "--workdir", workdir,
           "--override", f"training.num_steps={steps}",
           "--override", "training.batch_size=64",
           "--override", "network.model_path=",
           # bound train-time periodic evals; the sweep needs the ckpt
           "--override", "testing.num_test=16",
           "--override", "testing.batch_size=16",
           "--override", "testing.encoder_reuse=1"]
    for o in extra:
        cmd += ["--override", o]
    print(f"[cond_sweep] training {spec} -> {workdir}", flush=True)
    subprocess.run(cmd, cwd=REPO, env=cell_env(), check=True,
                   timeout=timeout)


def build_commands(args, uncond_ckpt: str, amort_ckpt: str):
    """The eval grid, via the parity CommandsBuilder (create_commands.py)."""
    from tpu_diffusion.cli.sweep import CommandsBuilder

    def base(cond: str, ckpt: str) -> str:
        extra = " ".join(f"--override {o}" for o in args.extra_override)
        return (f"{sys.executable} -m tpu_diffusion.cli.main "
                f"--config mnist,inpainting,{cond} --mode eval "
                f"--override network.model_path={ckpt} "
                f"--override testing.num_test={args.num_test} "
                f"--override testing.batch_size={args.eval_batch} "
                f"--override testing.encoder_reuse=1"
                + (f" {extra}" if extra else ""))

    seeds = args.seeds.split(",")
    n3_seeds = args.n3_seeds.split(",") if args.n3_seeds else []
    cmds: list[str] = []
    # reconstruction guidance: gamma x update_rule x n_corrector (verdict
    # grid; reference schedule.sh sweeps the same conditioning knobs)
    b = base("reconstruction_guidance", uncond_ckpt)
    cmds += (CommandsBuilder(b)
             .add("conditioning.gamma", [1, 10, 100])
             .add("conditioning.update_rule", ["before", "after"])
             .add("conditioning.n_corrector", [0, 1])
             .add("testing.seed", seeds).build())
    if n3_seeds:
        cmds += (CommandsBuilder(b)
                 .add("conditioning.gamma", [1, 10, 100])
                 .add("conditioning.update_rule", ["before", "after"])
                 .add("conditioning.n_corrector", [3])
                 .add("testing.seed", n3_seeds).build())
    # replacement: +/- noise
    cmds += (CommandsBuilder(base("replacement", uncond_ckpt))
             .add("conditioning.noise", ["true", "false"])
             .add("testing.seed", seeds).build())
    # amortized baseline (its own trained weights)
    cmds += (CommandsBuilder(base("amortized", amort_ckpt))
             .add("testing.seed", seeds).build())
    return cmds


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="results_conditioning_sweep")
    p.add_argument("--train_steps", type=int, default=800)
    p.add_argument("--num_test", type=int, default=96)
    p.add_argument("--eval_batch", type=int, default=32)
    p.add_argument("--seeds", default="0,1")
    p.add_argument("--n3_seeds", default="0",
                   help="seeds for the 4x-cost n_corrector=3 cells "
                        "('' skips them)")
    p.add_argument("--cell_timeout", type=int, default=2400)
    p.add_argument("--train_timeout", type=int, default=3600)
    p.add_argument("--extra_override", action="append", default=[],
                   help="extra dotted override applied to every train and "
                        "eval command (smoke testing: diffusion.num_steps=20)")
    args = p.parse_args(argv)

    w = os.path.abspath(args.workdir)
    os.makedirs(w, exist_ok=True)
    uncond = os.path.join(w, "train_uncond")
    amort = os.path.join(w, "train_amortized")
    train_ckpt("mnist,inpainting,reconstruction_guidance", uncond,
               args.train_steps, args.train_timeout, args.extra_override)
    train_ckpt("mnist,inpainting,amortized", amort,
               args.train_steps, args.train_timeout, args.extra_override)

    cmds = build_commands(args, os.path.join(uncond, "ckpt"),
                          os.path.join(amort, "ckpt"))
    with open(os.path.join(w, "commands_eval.txt"), "w") as f:
        f.write("\n".join(cmds) + "\n")
    print(f"[cond_sweep] {len(cmds)} eval cells", flush=True)

    logs = os.path.join(w, "logs")
    os.makedirs(logs, exist_ok=True)
    for i, cmd in enumerate(cmds):
        cell = hashlib.sha1(cmd.encode()).hexdigest()[:10]
        cell_dir = os.path.join(logs, f"cell_{cell}")
        if os.path.exists(os.path.join(cell_dir, "results.json")):
            print(f"[cond_sweep] {i+1}/{len(cmds)} done, skip {cell}",
                  flush=True)
            continue
        t0 = time.monotonic()
        full = shlex.split(cmd) + ["--workdir", cell_dir]
        print(f"[cond_sweep] {i+1}/{len(cmds)} {cmd}", flush=True)
        proc = subprocess.run(full, cwd=REPO, env=cell_env(),
                              timeout=args.cell_timeout)
        dt = time.monotonic() - t0
        ok = (proc.returncode == 0
              and os.path.exists(os.path.join(cell_dir, "results.json")))
        print(f"[cond_sweep] cell {cell}: rc={proc.returncode} "
              f"{'ok' if ok else 'FAILED'} {dt:.0f}s", flush=True)
        if ok:
            with open(os.path.join(cell_dir, "wall_clock.json"), "w") as f:
                json.dump({"wall_clock_s": round(dt, 1)}, f)

    # aggregate: one table over every cell dir, grouped by the mechanism
    # knobs, t-CIs over eval seeds (read_results.py:14-35 parity)
    from tpu_diffusion.cli.sweep import aggregate, collect_results
    rows = collect_results(logs)
    if not rows:
        print("[cond_sweep] no results to aggregate")
        sys.exit(1)
    table = aggregate(rows, ["conditioning.name", "conditioning.gamma",
                             "conditioning.update_rule",
                             "conditioning.n_corrector",
                             "conditioning.noise"])
    out_csv = os.path.join(w, "aggregated.csv")
    table.to_csv(out_csv, index=False)
    cols = [c for c in table.columns
            if c.startswith("conditioning.")
            or any(c.startswith(f"result.{m}_mean_{s}")
                   for m in ("psnr", "ssim", "mse")
                   for s in ("mean", "ci95"))
            or c in ("result.lpips_mean", "result.lpips_ci95")]
    try:
        md = table[cols].to_markdown(index=False, floatfmt=".4f")
    except ImportError:  # tabulate absent
        md = "```\n" + table[cols].to_string(index=False) + "\n```"
    with open(os.path.join(w, "summary.md"), "w") as f:
        f.write("# Conditioning-mechanism comparison (MNIST inpainting)\n\n"
                f"train_steps={args.train_steps}, num_test={args.num_test},"
                f" seeds={args.seeds} (n_corrector=3: {args.n3_seeds})\n\n"
                + md + "\n")
    print(table.to_string(), flush=True)
    print(f"[cond_sweep] wrote {out_csv}", flush=True)


if __name__ == "__main__":
    main()
