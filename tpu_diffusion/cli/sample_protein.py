"""Motif-scaffolded protein generation.

Rebuilds `amortised diffusion/src/sample.py`: load a trained GVP denoiser
checkpoint, build a Structconditioner around motif coordinates (from a .npy
file like the reference's 6E6R motif, or a deterministic synthetic helix
motif), draw blob priors with lengths from the dataset, run guided reverse
diffusion (conditioner active for step < 125, gs default 1500), and save
per-sample .npy coordinates + conditioner losses + summary stats.

The whole guided chain (250 steps x GVP forward + guidance grad) is one
jitted lax.scan — the reference's hottest loop (sample.py:92,
sde_diffusion.py:299-351) with no per-step host round trips.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.cli.train_protein import build_model
from tpu_diffusion.protein.conditioner import (
    Structconditioner, place_indices_block_within_bounds)
from tpu_diffusion.protein.data import (COORD_SCALE, get_protein_data,
                                        synthetic_ca_chains)
from tpu_diffusion.protein.sde import HoogeboomGraphSDE
from tpu_diffusion.train.checkpoint import CheckpointManager


def load_motif(path: str | None, indices_path: str | None, max_len: int,
               seed: int = 0):
    """Motif coords (scaled) + centered indices. Falls back to a synthetic
    8-residue helix fragment when no .npy is given."""
    if path and os.path.exists(path):
        coords = np.load(path).astype(np.float32) * COORD_SCALE
        coords = coords - coords.mean(0, keepdims=True)
        if indices_path and os.path.exists(indices_path):
            idx = np.load(indices_path).astype(np.int32)
        else:
            idx = np.arange(len(coords), dtype=np.int32)
    else:
        frag = synthetic_ca_chains(1, max_len=16, min_len=8, seed=seed)
        m = 8
        coords = frag.positions[0][:m]
        coords = coords - coords.mean(0, keepdims=True)
        idx = np.arange(m, dtype=np.int32)
    idx = np.asarray(place_indices_block_within_bounds(
        jnp.asarray(idx), max_len))
    return jnp.asarray(coords), jnp.asarray(idx)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", default="results_protein/gvp/ckpt")
    p.add_argument("--output_dir", default="results_protein/samples")
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=20)
    p.add_argument("--max_len", type=int, default=112)
    p.add_argument("--node_scalars", type=int, default=256)
    p.add_argument("--node_vectors", type=int, default=64)
    p.add_argument("--conv_layers", type=int, default=5)
    p.add_argument("--diffusion_steps", type=int, default=250)
    p.add_argument("--motif_npy", default=None)
    p.add_argument("--motif_indices_npy", default=None)
    p.add_argument("--guidance_scale", type=float, default=1500.0)
    p.add_argument("--cond_start_step", type=int, default=0,
                   help="conditioner active for step < this; 0 -> "
                        "diffusion_steps // 2 (the reference's 125 of "
                        "250 — guidance at t near 1, where beta is "
                        "large, explodes under the gs*a*(1-a) law)")
    p.add_argument("--no_conditioner", action="store_true")
    p.add_argument("--data_root", default="data/scope")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_plots", action="store_true",
                   help="3D structure PNG per sample + a trajectory GIF for "
                        "the first batch (reference sample.py plots/gifs)")
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    if args.cond_start_step <= 0:
        args.cond_start_step = args.diffusion_steps // 2
    model = build_model(args)
    diffuser = HoogeboomGraphSDE(num_steps=args.diffusion_steps)

    from tpu_diffusion.protein.sde import ProteinBatch
    init_batch = ProteinBatch.from_positions(
        jnp.zeros((1, args.max_len, 3)), jnp.ones((1, args.max_len), bool))
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch, jnp.zeros((1,)))
    mgr = CheckpointManager(args.ckpt_dir)
    assets, step = mgr.load({"params": params0, "ema": params0, "step": 0})
    params = assets["ema"]
    print(f"[sample_protein] restored step {step}")

    conditioner = None
    if not args.no_conditioner:
        motif_pos, motif_idx = load_motif(args.motif_npy,
                                          args.motif_indices_npy,
                                          args.max_len, args.seed)
        conditioner = Structconditioner(
            motif_pos=motif_pos, motif_indices=motif_idx,
            guidance_scale=args.guidance_scale)
        print(f"[sample_protein] motif: {motif_pos.shape[0]} residues at "
              f"{np.asarray(motif_idx).tolist()[:8]}...")

    # lengths drawn from the validation set (sample.py:80-85)
    ds = get_protein_data(args.data_root, max_len=args.max_len,
                          seed=args.seed + 1)

    def score_model(batch, t):
        return model.apply(params, batch, t)

    @jax.jit
    def run(key, lengths):
        k1, k2 = jax.random.split(key)
        blob = diffuser.sample_blob(k1, args.batch_size, args.max_len,
                                    lengths=lengths)
        return diffuser.reverse_diffusion_sampling(
            k2, blob, score_model, conditioner=conditioner,
            cond_start_step=args.cond_start_step)

    @jax.jit
    def run_with_traj(key, lengths):
        k1, k2 = jax.random.split(key)
        blob = diffuser.sample_blob(k1, args.batch_size, args.max_len,
                                    lengths=lengths)
        return diffuser.reverse_diffusion_sampling(
            k2, blob, score_model, conditioner=conditioner,
            cond_start_step=args.cond_start_step, save_trajectory=True)

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)
    saved = 0
    all_losses = []
    first_batch = True
    while saved < args.num_samples:
        key, k = jax.random.split(key)
        lengths = jnp.asarray(rng.choice(ds.lengths, args.batch_size))
        if args.save_plots and first_batch:
            traj, out = run_with_traj(k, lengths)
            from tpu_diffusion.eval.plotting import trajectory_gif
            t0 = np.asarray(traj)[:, 0]
            m0 = np.asarray(out.mask[0])
            trajectory_gif(t0[:, m0], os.path.join(
                args.output_dir, "trajectory_0.gif"), fps=10,
                stride=max(len(t0) // 40, 1))
        else:
            out = run(k, lengths)
        pos = np.asarray(out.pos)
        mask = np.asarray(out.mask)
        if conditioner is not None:
            losses = np.asarray(conditioner.final_loss(out))
            all_losses.extend(losses.tolist())
        for i in range(args.batch_size):
            if saved >= args.num_samples:
                break
            coords = pos[i][mask[i]] / COORD_SCALE  # back to Angstrom
            np.save(os.path.join(args.output_dir,
                                 f"sample_{saved:04d}.npy"), coords)
            from tpu_diffusion.protein.pdb import write_ca_pdb
            write_ca_pdb(coords, os.path.join(
                args.output_dir, f"sample_{saved:04d}.pdb"))
            if args.save_plots and first_batch and i < 4:
                from tpu_diffusion.eval.plotting import plot_structure
                fig = plot_structure(coords, f"sample {saved}")
                fig.savefig(os.path.join(args.output_dir,
                                         f"sample_{saved:04d}.png"))
            saved += 1
        first_batch = False
        print(f"[sample_protein] {saved}/{args.num_samples}")

    summary = {"num_samples": saved, "ckpt_step": int(step),
               "guidance_scale": args.guidance_scale
               if conditioner else None}
    if all_losses:
        summary["cond_loss_mean"] = float(np.mean(all_losses))
        summary["cond_loss_std"] = float(np.std(all_losses))
        np.save(os.path.join(args.output_dir, "cond_losses.npy"),
                np.asarray(all_losses))
    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("[sample_protein]", json.dumps(summary))


if __name__ == "__main__":
    main()
