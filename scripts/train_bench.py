"""Training-step benchmarks (VERDICT r2 item 3).

Measures steady-state train-step time / samples-per-sec / MFU on the real
chip for the reference's dominant workloads (the 400k-step CIFAR loop,
cifar10/train_cifar10.py:142-154, is the reference's main compute sink):

  a) CIFAR-10 CFM bs-128 (flagship recipe) — icfm, otcfm with the
     prefetching host-exact-OT pairing (losses/cfm.py:host_ot_pairs), and
     otcfm with pairing forced synchronous (prefetch=0) to expose the
     overlap win;
  b) amortized MNIST inpainting (experiments/main.py config, bs 32);
  c) 256px 4x-SR stretch config with Pallas flash attention fwd+bwd
     (bs 8, T=1024 at the attention resolutions).

Timing: steady-state loop with a trailing blocking host read (PERF.md
methodology — block_until_ready does not block on the axon backend).
Prints one JSON line per workload.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tpu_diffusion"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tpu_diffusion.parallel.mesh import make_mesh
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)

V5E_BF16_PEAK = 394e12


def time_steps(trainer, n_warmup=3, n_meas=20):
    """Steady-state seconds/step, measured with a final host read."""
    trainer.fit(n_warmup)
    # flush the pipeline before timing
    _ = float(np.asarray(jax.tree.leaves(trainer.state.params)[0]).ravel()[0])
    t0 = time.perf_counter()
    trainer.fit(n_meas)
    _ = float(np.asarray(jax.tree.leaves(trainer.state.params)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n_meas


def _report(name, batch, dt, step_flops=0.0, extra=None):
    rec = {"metric": f"train_step_{name}", "batch": batch,
           "step_ms": round(dt * 1e3, 3),
           "samples_per_sec": round(batch / dt, 2)}
    if step_flops:
        rec["mfu"] = round(step_flops / dt / V5E_BF16_PEAK, 4)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def bench_cifar(matcher_name: str, prefetch: int, batch: int = 128,
                n_meas: int = 30):
    from tpu_diffusion.cli.train_cifar10 import build_model, make_cfm_loss_fn
    from tpu_diffusion.data.registry import get_dataset, infinite_batches
    from tpu_diffusion.losses.cfm import get_matcher, host_ot_pairs

    mesh = make_mesh()
    ds = get_dataset("cifar10")("data", train=True)
    batches = infinite_batches(ds, batch, seed=0, flip=True)
    paired = matcher_name == "otcfm"
    if paired:
        batches = host_ot_pairs(batches, seed=0, prefetch=prefetch)
        matcher = get_matcher("icfm", sigma=0.0)
    else:
        matcher = get_matcher(matcher_name, sigma=0.0)
    model = build_model()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1,)),
                                 jnp.zeros((1, 32, 32, 3)))
    tx = make_optimizer(2e-4, warmup=5000, grad_clip=1.0)
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    loss_fn = make_cfm_loss_fn(model, matcher, paired=paired)
    step = make_train_step(loss_fn, tx, ema_decay=0.9999)
    trainer = Trainer(step, state, batches, mesh=mesh)
    dt = time_steps(trainer, n_meas=n_meas)
    name = matcher_name if not paired else f"otcfm_prefetch{prefetch}"
    return _report(f"cifar10_cfm_{name}_bs{batch}", batch, dt)


def bench_amortized_mnist(batch: int = 32, n_meas: int = 30):
    from tpu_diffusion.cli.main import (build, init_state,
                                        make_losses_and_samplers)
    from tpu_diffusion.data.registry import get_dataset, infinite_batches
    from tpu_diffusion.utils.config import get_config

    config = get_config("mnist,inpainting,amortized")
    config.training.batch_size = batch
    config.training.num_steps = 100
    mesh = make_mesh()
    parts = build(config, mesh)
    ds = get_dataset("mnist")("data", train=True)
    state, tx = init_state(config, parts, jax.random.PRNGKey(0))
    loss_fn, _, _ = make_losses_and_samplers(config, parts, None)
    step = make_train_step(loss_fn, tx,
                           ema_decay=config.training.ema_decay,
                           ema_update_every=config.training.ema_update_every)
    batches = infinite_batches(ds, batch, seed=0)
    trainer = Trainer(step, state, batches, mesh=mesh)
    dt = time_steps(trainer, n_meas=n_meas)
    return _report("amortized_mnist_inpaint_bs%d" % batch, batch, dt)


def bench_sr256(batch: int = 8, n_meas: int = 10):
    from tpu_diffusion.cli.train_cfm_conditional import (build,
                                                         make_condition_fn,
                                                         make_loss_fn)
    from tpu_diffusion.data.registry import get_dataset, infinite_batches
    from tpu_diffusion.losses.cfm import get_matcher

    mesh = make_mesh()
    ds = get_dataset("synthetic256")("data", train=True)
    model, dim = build("superres", "synthetic256")
    matcher = get_matcher("icfm", sigma=0.0)
    condition_fn = make_condition_fn("superres", dim, 20, -2.0, 4)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1,) + dim)
    params = jax.jit(model.init)(rng, jnp.zeros((1,)), x,
                                 condition_fn(rng, x))
    tx = make_optimizer(2e-4, warmup=100, grad_clip=1.0)
    state = TrainState.create(params, tx, rng)
    loss_fn = make_loss_fn(model, matcher, condition_fn, "superres",
                           False, -2.0)
    step = make_train_step(loss_fn, tx)
    batches = infinite_batches(ds, batch, seed=0)
    trainer = Trainer(step, state, batches, mesh=mesh)
    dt = time_steps(trainer, n_warmup=2, n_meas=n_meas)
    return _report("sr256_flash_bs%d" % batch, batch, dt,
                   extra={"attention": "pallas flash fwd+bwd @ T<=1024"})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default="",
                   help="comma list: cifar_icfm,cifar_otcfm,cifar_otcfm_sync,"
                        "amortized,sr256 (default all)")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    results = []
    if only is None or "cifar_icfm" in only:
        results.append(bench_cifar("icfm", prefetch=0))
    if only is None or "cifar_otcfm" in only:
        results.append(bench_cifar("otcfm", prefetch=2))
    if only is None or "cifar_otcfm_sync" in only:
        results.append(bench_cifar("otcfm", prefetch=0))
    if only is None or "amortized" in only:
        results.append(bench_amortized_mnist())
    if only is None or "sr256" in only:
        results.append(bench_sr256())
    with open("results_train_bench.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
