"""Protein C-alpha backbone diffusion training.

Rebuilds `amortised diffusion/src/train.py` (hydra + Lightning + SLURM) as a
mesh-sharded jitted loop:

    python -m tpu_diffusion.cli.train_protein --num_steps 20000 ...

Diffuser: HoogeboomGraphSDE(N=250) (configs/diffusion/default.yaml:7-19);
model: GVPDenoiser (configs/model/gvp_denoiser.yaml: max_protein_length 112,
(256, 64) hidden, 5 conv layers); loss: DSM + 0.25 * (backbone + distogram)
aux below the t-cutoff (resdiff.py:111-157); Adam lr 1e-4 (:260-261).
Checkpoint/resume replaces the SLURM timeout-requeue scripts: orbax keeps
the top checkpoints and training restarts from the latest automatically.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.parallel.mesh import make_mesh
from tpu_diffusion.protein.data import get_protein_data, protein_batches
from tpu_diffusion.protein.denoiser import GVPDenoiser
from tpu_diffusion.protein.resdiff import resdiff_loss
from tpu_diffusion.protein.sde import HoogeboomGraphSDE, ProteinBatch
from tpu_diffusion.train.actions import PeriodicCallback
from tpu_diffusion.train.checkpoint import CheckpointManager
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)
from tpu_diffusion.train.writers import LocalWriter


def build_model(args) -> GVPDenoiser:
    return GVPDenoiser(
        max_protein_length=args.max_len,
        n_h_node_feats=(args.node_scalars, args.node_vectors),
        n_h_edge_feats=(args.node_scalars, args.node_vectors),
        n_conv_layers=args.conv_layers,
        n_msg_layers=3, n_ff_layers=1,
        num_steps=args.diffusion_steps,
        remat=getattr(args, "remat", False))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", default="results_protein")
    p.add_argument("--name", default="gvp")
    p.add_argument("--num_steps", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max_len", type=int, default=112)
    p.add_argument("--node_scalars", type=int, default=256)
    p.add_argument("--node_vectors", type=int, default=64)
    p.add_argument("--conv_layers", type=int, default=5)
    p.add_argument("--diffusion_steps", type=int, default=250)
    p.add_argument("--aux_weight", type=float, default=0.25)
    p.add_argument("--aux_cutoff", type=float, default=0.25)
    p.add_argument("--distogram", default="sequential",
                   choices=["sequential", "dense"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize GVP conv layers in backward — "
                        "required for the reference bs 32 on a 16 GB v5e")
    p.add_argument("--data_root", default="data/scope")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_every", type=int, default=0,
                   help="0 -> num_steps // 10")
    args = p.parse_args(argv)

    savedir = os.path.join(args.output_dir, args.name)
    os.makedirs(savedir, exist_ok=True)
    writer = LocalWriter(savedir)
    writer.log_hparams(vars(args))

    mesh = make_mesh()
    ds = get_protein_data(args.data_root, max_len=args.max_len,
                          seed=args.seed)
    print(f"[train_protein] {len(ds)} proteins "
          f"({'synthetic' if ds.synthetic else args.data_root}), "
          f"max_len {ds.max_len}")

    diffuser = HoogeboomGraphSDE(num_steps=args.diffusion_steps)
    model = build_model(args)

    def loss_fn(params, key, batch):
        pb = ProteinBatch.from_positions(batch["pos"], batch["mask"])
        apply = lambda b, t: model.apply(params, b, t)
        total, _ = resdiff_loss(key, apply, diffuser, pb,
                                aux_weight=args.aux_weight,
                                aux_cutoff=args.aux_cutoff,
                                distogram=args.distogram)
        return total

    rng = jax.random.PRNGKey(args.seed)
    init_batch = ProteinBatch.from_positions(
        jnp.zeros((1, args.max_len, 3)),
        jnp.ones((1, args.max_len), bool))
    params = jax.jit(model.init)(rng, init_batch, jnp.zeros((1,)))
    print(f"[train_protein] "
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.2f}M params")

    tx = make_optimizer(args.lr, warmup=0, grad_clip=1.0,
                        schedule="constant")
    state = TrainState.create(params, tx, rng)
    train_step = make_train_step(loss_fn, tx, ema_decay=0.999)

    ckpt = CheckpointManager(os.path.join(savedir, "ckpt"), maximum=3)
    # elastic resume: restart from latest checkpoint when present
    restored, start = ckpt.load({"params": params, "ema": params,
                                 "step": 0})
    if start:
        print(f"[train_protein] resuming from step {start}")
        # restore the EMA too: leaving state.ema at the fresh random init
        # would blend ~0.999^k of garbage into every post-resume EMA read
        state = state.replace(params=restored["params"],
                              ema=state.ema.replace(
                                  params=restored["ema"]),
                              step=jnp.asarray(start, jnp.int32))

    every = args.ckpt_every or max(args.num_steps // 10, 1)

    def save(step, state, **kw):
        ckpt.save(step, jax.tree.map(np.asarray, {
            "params": state.params, "ema": state.ema.params,
            "step": step}))

    callbacks = [
        PeriodicCallback(callback_fn=lambda step, metrics, **kw:
                         writer.write_scalars(step, metrics),
                         every_steps=20),
        PeriodicCallback(callback_fn=save, every_steps=every),
    ]
    batches = protein_batches(ds, args.batch_size, seed=args.seed)
    trainer = Trainer(train_step, state, batches, mesh=mesh,
                      callbacks=callbacks)
    state = trainer.fit(max(args.num_steps - start, 0))
    save(int(state.step), state)
    writer.flush()
    print(f"[train_protein] done at step {int(state.step)}")


if __name__ == "__main__":
    main()
