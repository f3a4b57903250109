"""Train the flagship CIFAR-10 CFM recipe on the chip and compute an
FID-vs-step curve — the trained-model half of the BASELINE.md north star.

Runs everything in ONE process (one TPU session, shared compile cache):

  1. train the reference CIFAR config (128ch UNet, bs 128, Adam 2e-4 +
     warmup + grad-clip 1.0, OT-CFM with host-side exact-OT pairing —
     cifar10/train_cifar10.py:92-154) on the registry's cifar10 dataset
     (synthetic fallback in this zero-egress environment — the FID trend is
     self-consistent: same features, same real statistics, all snapshots);
  2. snapshot live params at the requested steps (EMA 0.9999 cannot
     converge in a few-thousand-step run, so the curve uses live params;
     the final EMA point is reported too);
  3. for each snapshot, generate `--num_gen` images with the fixed-step
     Euler-100 protocol (utils_cifar.py:34-41) and compute the Frechet
     distance against the train split (cifar10/compute_fid.py:92-100
     protocol, random_conv features — see eval/fid.py comparability note).

Writes results_fid_curve/fid_curve.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tpu_diffusion"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from tpu_diffusion.cli.train_cifar10 import build_model, make_cfm_loss_fn
from tpu_diffusion.data.registry import (epoch_batches, get_dataset,
                                         infinite_batches)
from tpu_diffusion.eval.fid import (fid_caveat,
                                    compute_statistics, frechet_distance,
                                    make_feature_fn)
from tpu_diffusion.losses.cfm import get_matcher, host_ot_pairs
from tpu_diffusion.parallel.mesh import make_mesh
from tpu_diffusion.sampling.ode import odeint
from tpu_diffusion.train.actions import PeriodicCallback
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot_steps",
                   default="0,250,500,1000,2000,3000,4500,6000")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_channel", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--num_gen", type=int, default=2048)
    p.add_argument("--gen_batch", type=int, default=256)
    p.add_argument("--sample_steps", type=int, default=100)
    p.add_argument("--features", default="random_conv")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="results_fid_curve")
    args = p.parse_args(argv)

    snap_steps = sorted({int(s) for s in args.snapshot_steps.split(",")})
    total_steps = max(snap_steps)
    os.makedirs(args.out, exist_ok=True)

    mesh = make_mesh()
    ds = get_dataset("cifar10")("data", train=True)
    h, w, c = ds.shape
    print(f"[fid_curve] dataset cifar10: {len(ds)} imgs {ds.shape}, "
          f"synthetic={ds.synthetic}", flush=True)

    batches = host_ot_pairs(
        infinite_batches(ds, args.batch_size, seed=args.seed, flip=True),
        seed=args.seed)
    matcher = get_matcher("icfm", sigma=0.0)  # OT-CFM after host pairing

    model = build_model(image_size=h, num_channels=args.num_channel,
                        channels=c)
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(rng, jnp.zeros((1,)),
                                 jnp.zeros((1, h, w, c)))
    n_params = sum(q.size for q in jax.tree.leaves(params))
    print(f"[fid_curve] {n_params/1e6:.2f}M params", flush=True)

    tx = make_optimizer(args.lr, warmup=args.warmup, grad_clip=1.0,
                        schedule="warmup")
    state = TrainState.create(params, tx, rng)
    loss_fn = make_cfm_loss_fn(model, matcher, paired=True)
    train_step = make_train_step(loss_fn, tx, ema_decay=0.9999)

    snaps = {0: jax.tree.map(np.asarray, params)}
    losses = {}

    def snap(step, state, metrics=None, **kw):
        snaps[step] = jax.tree.map(np.asarray, state.params)
        losses[step] = float(metrics["loss"]) if metrics else None
        print(f"[fid_curve] snapshot @ step {step} "
              f"loss={losses[step]}", flush=True)

    callbacks = [
        PeriodicCallback(callback_fn=lambda step, metrics, **kw: print(
            f"[fid_curve] step {step} loss={metrics['loss']:.4f} "
            f"({metrics['steps_per_sec']:.2f} steps/s)", flush=True),
            every_steps=250),
        PeriodicCallback(callback_fn=snap,
                         on_steps=[s for s in snap_steps if s > 0]),
    ]
    trainer = Trainer(train_step, state, batches, mesh=mesh,
                      callbacks=callbacks)
    t0 = time.monotonic()
    state = trainer.fit(total_steps)
    train_secs = time.monotonic() - t0
    print(f"[fid_curve] trained {total_steps} steps in {train_secs:.1f}s "
          f"({total_steps/train_secs:.2f} steps/s incl. compile)",
          flush=True)
    ema_params = jax.tree.map(np.asarray, state.ema.params)

    # ---- FID per snapshot -------------------------------------------------
    feature_fn = make_feature_fn(args.features, image_size=h, channels=c)
    real_feats = [np.asarray(feature_fn(jnp.asarray(b)))
                  for b in epoch_batches(ds, args.gen_batch)]
    mu_r, s_r = compute_statistics(np.concatenate(real_feats))
    print(f"[fid_curve] real stats over {len(ds)} imgs", flush=True)

    @jax.jit
    def gen_batch(params, key):
        noise = jax.random.normal(key, (args.gen_batch, h, w, c))
        x1, _ = odeint(lambda t, x: model.apply(params, t, x), noise,
                       method="euler", num_steps=args.sample_steps)
        x1 = jnp.clip(x1, -1, 1)
        u8 = jnp.clip((x1 + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        return u8.astype(jnp.float32) / 127.5 - 1.0

    def fid_of(params) -> float:
        params = jax.tree.map(jnp.asarray, params)
        key = jax.random.PRNGKey(args.seed + 7)
        feats = []
        n_batches = -(-args.num_gen // args.gen_batch)
        for i in range(n_batches):
            key, k = jax.random.split(key)
            feats.append(np.asarray(feature_fn(gen_batch(params, k))))
        mu_f, s_f = compute_statistics(np.concatenate(feats))
        return frechet_distance(mu_r, s_r, mu_f, s_f)

    rows = []
    for step in snap_steps:
        t1 = time.monotonic()
        score = fid_of(snaps[step])
        rows.append({"step": step, "fid": round(score, 3),
                     "loss": losses.get(step)})
        print(f"[fid_curve] step {step}: FID {score:.3f} "
              f"({time.monotonic()-t1:.1f}s)", flush=True)
    ema_fid = fid_of(ema_params)
    print(f"[fid_curve] final EMA params: FID {ema_fid:.3f}", flush=True)

    result = {
        "recipe": "otcfm host-exact-OT, bs %d, lr %g, warmup %d, "
                  "grad-clip 1.0" % (args.batch_size, args.lr, args.warmup),
        "dataset": "cifar10" + (" (synthetic fallback)" if ds.synthetic
                                else ""),
        "features": args.features, "num_gen": args.num_gen,
        "sampler": f"euler-{args.sample_steps}",
        "params_m": round(n_params / 1e6, 2),
        "train_steps_per_sec_incl_compile": round(total_steps / train_secs,
                                                  3),
        "curve": rows, "final_ema_fid": round(ema_fid, 3),
        **fid_caveat(args.features, synthetic_data=ds.synthetic),
        "monotone_decreasing": all(
            rows[i]["fid"] >= rows[i + 1]["fid"] * 0.999
            for i in range(len(rows) - 1)),
    }
    path = os.path.join(args.out, "fid_curve.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print("| step | loss | FID |")
    print("|---|---|---|")
    for r in rows:
        loss = "" if r["loss"] is None else f"{r['loss']:.4f}"
        print(f"| {r['step']} | {loss} | {r['fid']:.3f} |")
    print(f"[fid_curve] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
