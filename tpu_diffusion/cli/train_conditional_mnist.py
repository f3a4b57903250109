"""Class-conditional generation: conditional CFM / guided OT-CFM / SF2M.

Rebuilds the `conditional_mnist.ipynb` pipelines (SURVEY.md §2.1):

  * `--variant cfm`   — class-conditional I-CFM: v(t, x, y) trained with
    labels as class embeddings (notebook cells 2-5);
  * `--variant otcfm` — OT-CFM with `guided_sample_location_and_conditional_
    flow`: the exact-OT (or sinkhorn) plan permutes labels with x1
    (cells 6-8);
  * `--variant sf2m`  — Schrödinger-bridge flow matching with TWO heads
    (velocity + score), score loss mean((lambda_t * s + eps)^2), sampling by
    the generative SDE dx = [v + sigma^2/2 * score] dt + sigma dW
    (torchsde reverse SDE in the notebook; here a jitted EM scan)
    (cells 9-11).

Generation: per-class grids via conditional ODE (or SDE for sf2m).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.data.registry import get_dataset
from tpu_diffusion.losses.cfm import (SchrodingerBridgeConditionalFlowMatcher,
                                      cfm_loss, get_matcher)
from tpu_diffusion.models.unet import UNetModelWrapper
from tpu_diffusion.parallel.mesh import make_mesh
from tpu_diffusion.sampling.ode import odeint
from tpu_diffusion.train.actions import PeriodicCallback
from tpu_diffusion.train.checkpoint import CheckpointManager
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)
from tpu_diffusion.train.writers import LocalWriter

NUM_CLASSES = 10


def build_model(num_channels: int = 32, image_size: int = 28,
                channels: int = 1) -> UNetModelWrapper:
    return UNetModelWrapper(
        dim=(image_size, image_size, channels), num_channels=num_channels,
        num_heads=4, attention_resolutions="14" if image_size == 28
        else "16", num_classes=NUM_CLASSES)


def labeled_batches(ds, batch_size: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = len(ds)
    while True:
        perm = rng.permutation(n)
        for s in range(0, n - batch_size + 1, batch_size):
            idx = perm[s:s + batch_size]
            yield {"x": ds.images[idx], "y": ds.labels[idx]}


def class_consistency(gen: np.ndarray, labels: np.ndarray,
                      templates: np.ndarray) -> dict:
    """Nearest-template classification of generated digits.

    `templates` [K,H,W,C] are per-class mean images of the training set;
    a generated image is "consistent" when its nearest template (MSE) is
    its conditioning class. Measurable without real MNIST: the synthetic
    fallback gives each class a distinct blob position + texture frequency
    (data/registry.py:synthetic_images), so the per-class means separate.
    Returns overall accuracy, per-class accuracy, and the mean PSNR of
    each image against its OWN class template."""
    d = ((gen[:, None] - templates[None]) ** 2).mean(axis=(2, 3, 4))  # [N,K]
    pred = d.argmin(axis=1)
    own = d[np.arange(len(gen)), labels]
    acc_per_class = [float((pred[labels == k] == k).mean())
                     if (labels == k).any() else None
                     for k in range(len(templates))]
    return {
        "accuracy": float((pred == labels).mean()),
        "per_class_accuracy": acc_per_class,
        "psnr_to_own_template": float(np.mean(
            10.0 * np.log10(4.0 / np.maximum(own, 1e-10)))),
    }


def class_templates(ds) -> np.ndarray:
    return np.stack([ds.images[ds.labels == k].mean(axis=0)
                     for k in range(NUM_CLASSES)])


def sf2m_generative_sde(flow_apply, score_apply, key, x0, y, sigma: float,
                        num_steps: int = 100):
    """dx = [v + sigma^2/2 score] dt + sigma dW, t: 0 -> 1 (EM scan)."""
    ts = jnp.linspace(0.0, 1.0, num_steps + 1)

    def body(carry, k):
        x, key = carry
        key, nk = jax.random.split(key)
        t = jnp.full((x.shape[0],), ts[k])
        dt = ts[k + 1] - ts[k]
        drift = flow_apply(t, x, y) + 0.5 * sigma**2 * score_apply(t, x, y)
        noise = jax.random.normal(nk, x.shape, x.dtype)
        last = (k == num_steps - 1).astype(x.dtype)
        x = x + dt * drift + sigma * jnp.sqrt(dt) * noise * (1.0 - last)
        return (x, key), None

    (x1, _), _ = jax.lax.scan(body, (x0, key), jnp.arange(num_steps))
    return jnp.clip(x1, -1, 1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="cfm",
                   choices=["cfm", "otcfm", "sf2m"])
    p.add_argument("--output_dir", default="results_conditional")
    p.add_argument("--num_channel", type=int, default=32)
    p.add_argument("--num_steps", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--sigma", type=float, default=0.1,
                   help="path noise (sf2m bridge sigma)")
    p.add_argument("--sample_steps", type=int, default=100)
    p.add_argument("--sample_grid_per_class", type=int, default=8)
    p.add_argument("--save_every", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_root", default="data")
    args = p.parse_args(argv)

    savedir = os.path.join(args.output_dir, args.variant)
    os.makedirs(savedir, exist_ok=True)
    writer = LocalWriter(savedir)
    writer.log_hparams(vars(args))

    mesh = make_mesh()
    ds = get_dataset("mnist")(args.data_root, train=True)
    model = build_model(args.num_channel)
    sf2m = args.variant == "sf2m"
    score_model = build_model(args.num_channel) if sf2m else None

    if args.variant == "cfm":
        matcher = get_matcher("icfm", sigma=args.sigma)
    elif args.variant == "otcfm":
        matcher = get_matcher("otcfm", sigma=args.sigma, method="sinkhorn")
    else:
        matcher = SchrodingerBridgeConditionalFlowMatcher(sigma=args.sigma)

    rng = jax.random.PRNGKey(args.seed)
    x = jnp.zeros((2, 28, 28, 1))
    y = jnp.zeros((2,), jnp.int32)
    t0 = jnp.zeros((2,))
    params = {"flow": jax.jit(model.init)(rng, t0, x, y)}
    if sf2m:
        params["score"] = score_model.init(jax.random.fold_in(rng, 1),
                                           t0, x, y)

    def loss_fn(p, key, batch):
        x1, y1 = batch["x"], batch["y"]
        k0, km = jax.random.split(key)
        x0 = jax.random.normal(k0, x1.shape, x1.dtype)
        if sf2m:
            t, xt, ut, eps = \
                matcher.sample_location_and_conditional_flow_with_eps(
                    km, x0, x1)
            vt = model.apply(p["flow"], t, xt, y1)
            lam = matcher.compute_lambda(t)
            st = score_model.apply(p["score"], t, xt, y1)
            flow_l = cfm_loss(vt, ut)
            score_l = jnp.mean(
                (lam.reshape(-1, 1, 1, 1) * st + eps) ** 2)
            return flow_l + score_l
        t, xt, ut, y1p = matcher.guided_sample_location_and_conditional_flow(
            km, x0, x1, y1)
        vt = model.apply(p["flow"], t, xt, y1p)
        return cfm_loss(vt, ut)

    tx = make_optimizer(args.lr, warmup=args.warmup, grad_clip=1.0)
    state = TrainState.create(params, tx, rng)
    train_step = make_train_step(loss_fn, tx, ema_decay=args.ema_decay)
    ckpt = CheckpointManager(os.path.join(savedir, "ckpt"), maximum=2)
    templates = class_templates(ds)
    class_trend: list = []

    def sample_grid(step, state, **kw):
        p = state.ema.params
        n = args.sample_grid_per_class
        y = jnp.repeat(jnp.arange(NUM_CLASSES), n)
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), step)
        x0 = jax.random.normal(key, (NUM_CLASSES * n, 28, 28, 1))
        if sf2m:
            imgs = sf2m_generative_sde(
                lambda t, x, yy: model.apply(p["flow"], t, x, yy),
                lambda t, x, yy: score_model.apply(p["score"], t, x, yy),
                key, x0, y, args.sigma, args.sample_steps)
        else:
            v = lambda t, x: model.apply(p["flow"], t, x, y)
            imgs, _ = odeint(v, x0, method="euler",
                             num_steps=args.sample_steps)
            imgs = jnp.clip(imgs, -1, 1)
        imgs_np = np.asarray(imgs)
        writer.write_images(step, {f"{args.variant}_classes": imgs_np})
        # per-class consistency trend (nearest-template classification)
        row = {"step": int(step),
               **class_consistency(imgs_np, np.asarray(y), templates)}
        class_trend.append(row)
        with open(os.path.join(savedir, "class_trend.json"), "w") as f:
            import json
            json.dump(class_trend, f, indent=2)
        print(f"[train_conditional_mnist] step {step} class-consistency "
              f"acc={row['accuracy']:.3f} "
              f"psnr_own={row['psnr_to_own_template']:.2f}", flush=True)
        ckpt.save(step, jax.tree.map(np.asarray, {
            "params": state.params, "ema": state.ema.params,
            "step": step}))

    every = args.save_every or max(args.num_steps // 5, 1)
    callbacks = [
        PeriodicCallback(callback_fn=lambda step, metrics, **kw:
                         writer.write_scalars(step, metrics),
                         every_steps=50),
        PeriodicCallback(callback_fn=sample_grid, every_steps=every),
    ]
    trainer = Trainer(train_step, state, labeled_batches(
        ds, args.batch_size, args.seed), mesh=mesh, callbacks=callbacks)
    state = trainer.fit(args.num_steps)
    sample_grid(int(state.step), state)
    writer.flush()
    print(f"[train_conditional_mnist] {args.variant} done at "
          f"step {int(state.step)}")


if __name__ == "__main__":
    main()
