"""CIFAR-10 conditional-flow-matching training.

Rebuilds `cifar10/train_cifar10.py` with the same flag surface:

    python -m tpu_diffusion.cli.train_cifar10 --model otcfm \
        --lr 2e-4 --ema_decay 0.9999 --batch_size 128 --total_steps 400001 \
        --warmup 5000 --save_step 20000

Matcher selection {otcfm, icfm, fm, si} mirrors train_cifar10.py:126-137;
the recipe is Adam + warmup LambdaLR + grad-clip 1.0 + EMA 0.9999
(:105-107, :148-154). The reference's `--parallel` DataParallel flag is
replaced by the mesh: batch is sharded over all chips automatically (and
norm statistics stay global — fixing the README's DP quality caveat).
Periodic sample grids use the Euler NeuralODE protocol (100 fixed steps,
utils_cifar.py:13-41); checkpoints store {params, ema, opt, step}.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.data.registry import get_dataset, infinite_batches
from tpu_diffusion.losses.cfm import cfm_loss, get_matcher, host_ot_pairs
from tpu_diffusion.models.unet import UNetModelWrapper
from tpu_diffusion.parallel.mesh import make_mesh
from tpu_diffusion.sampling.ode import odeint
from tpu_diffusion.train.actions import PeriodicCallback
from tpu_diffusion.train.checkpoint import CheckpointManager
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)
from tpu_diffusion.train.writers import LocalWriter


def build_model(image_size: int = 32, num_channels: int = 128,
                channels: int = 3, attention_impl: str = "auto"):
    """The reference CIFAR UNet config (train_cifar10.py:92-103)."""
    return UNetModelWrapper(
        dim=(image_size, image_size, channels), num_channels=num_channels,
        channel_mult=(1, 2, 2, 2), num_heads=4,
        attention_resolutions="16", dropout=0.1,
        attention_impl=attention_impl)


def make_cfm_loss_fn(model, matcher, paired: bool = False):
    """CFM regression loss: t,xt,ut from the matcher; mean((v - u)^2)
    (train_cifar10.py:145-149).

    `paired=False`: batch is x1; x0 ~ N(0, I) is drawn in-step.
    `paired=True`: batch is an (x0, x1) tuple already coupled on the host
    (`losses.cfm.host_ot_pairs`) — the TPU exact-OT path.
    """

    def loss_fn(params, key, batch):
        k0, km, kd = jax.random.split(key, 3)
        if paired:
            x0, x1 = batch
        else:
            x1 = batch
            x0 = jax.random.normal(k0, x1.shape, x1.dtype)
        t, xt, ut = matcher.sample_location_and_conditional_flow(km, x0, x1)
        vt = model.apply(params, t, xt, train=True,
                         rngs={"dropout": kd})
        return cfm_loss(vt, ut)

    return loss_fn


def generate_samples(model, params, key, n: int = 64, image_size: int = 32,
                     channels: int = 3, steps: int = 100,
                     method: str = "euler"):
    """8x8 sample grid via fixed-step ODE from noise (utils_cifar.py:13-41)."""
    x0 = jax.random.normal(key, (n, image_size, image_size, channels))

    def v(t, x):
        return model.apply(params, t, x)

    x1, nfe = odeint(v, x0, method=method, num_steps=steps)
    return jnp.clip(x1, -1, 1), nfe


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="otcfm",
                   choices=["otcfm", "icfm", "fm", "si"],
                   help="flow matcher (train_cifar10.py:24-27)")
    p.add_argument("--output_dir", default="results")
    p.add_argument("--num_channel", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--total_steps", type=int, default=400001)
    p.add_argument("--warmup", type=int, default=5000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--save_step", type=int, default=20000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_root", default="data")
    p.add_argument("--ot_method", default="exact",
                   choices=["exact", "sinkhorn"],
                   help="minibatch-OT solver for otcfm: exact pairs on the "
                        "host between steps (TPU-safe, reference protocol); "
                        "sinkhorn is entropic OT fully on-device")
    p.add_argument("--attention_impl", default="auto",
                   choices=["xla", "pallas"])
    p.add_argument("--sample_grid", type=int, default=64,
                   help="images per periodic sample grid")
    p.add_argument("--sample_steps", type=int, default=100,
                   help="fixed Euler steps for periodic sampling")
    args = p.parse_args(argv)

    savedir = os.path.join(args.output_dir, args.model)
    os.makedirs(savedir, exist_ok=True)
    writer = LocalWriter(savedir)
    writer.log_hparams(vars(args))

    mesh = make_mesh()
    ds = get_dataset("cifar10")(args.data_root, train=True)
    batches = infinite_batches(ds, args.batch_size, seed=args.seed,
                               flip=True)  # RandomHorizontalFlip (:73)

    model = build_model(num_channels=args.num_channel,
                        attention_impl=args.attention_impl)
    # Exact OT pairs on the host between steps (TPU-safe: no callback in
    # the jitted step; the reference's POT plan is host-side too at
    # train_cifar10.py:147). After pairing, the in-step matcher is I-CFM.
    paired = args.model == "otcfm" and args.ot_method == "exact"
    if paired:
        batches = host_ot_pairs(batches, seed=args.seed)
        matcher = get_matcher("icfm", sigma=0.0)
    elif args.model == "otcfm":
        matcher = get_matcher("otcfm", sigma=0.0, method=args.ot_method)
    else:
        matcher = get_matcher(args.model, sigma=0.0)

    rng = jax.random.PRNGKey(args.seed)
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(rng, jnp.zeros((1,)), x)
    n_params = sum(p_.size for p_ in jax.tree.leaves(params))
    print(f"[train_cifar10] {args.model}: {n_params/1e6:.2f}M params, "
          f"{len(jax.devices())} devices")

    tx = make_optimizer(args.lr, warmup=args.warmup,
                        grad_clip=args.grad_clip, schedule="warmup")
    state = TrainState.create(params, tx, rng)
    loss_fn = make_cfm_loss_fn(model, matcher, paired=paired)
    train_step = make_train_step(loss_fn, tx, ema_decay=args.ema_decay)

    ckpt = CheckpointManager(os.path.join(savedir, "ckpt"), maximum=3)

    def save_and_sample(step, state, **kw):
        ckpt.save(step, jax.tree.map(np.asarray, {
            "params": state.params, "ema": state.ema.params,
            "step": step}))
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), step)
        grid, _ = generate_samples(model, state.ema.params, key,
                                   n=args.sample_grid,
                                   steps=args.sample_steps)
        writer.write_images(step, {f"{args.model}_generated": np.asarray(grid)})

    callbacks = [
        PeriodicCallback(callback_fn=lambda step, metrics, **kw:
                         writer.write_scalars(step, metrics),
                         every_steps=100),
        PeriodicCallback(callback_fn=save_and_sample,
                         every_steps=args.save_step),
    ]
    trainer = Trainer(train_step, state, batches, mesh=mesh,
                      callbacks=callbacks)
    state = trainer.fit(args.total_steps)
    save_and_sample(int(state.step), state)
    writer.flush()


if __name__ == "__main__":
    main()
