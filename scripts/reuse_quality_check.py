"""Trained-model acceptance check for encoder-reuse sampling (PERF.md).

Trains the MNIST amortized-inpainting DDPM for a few hundred steps on the
real TPU, then runs the SAME conditional eval (1000-step ancestral chain)
with the plain sampler and with encoder_reuse in {2, 4}, reporting
PSNR/SSIM against ground truth plus the wall time per eval batch. If the
cached metrics track the plain ones, the caching approximation holds on a
genuinely trained model, not just on perturbed random weights.

Usage: timeout 1700 python scripts/reuse_quality_check.py [train_steps]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_diffusion.conditioning.guidance import Amortized
from tpu_diffusion.conditioning.likelihoods import InPainting
from tpu_diffusion.core.schedules import DDPM
from tpu_diffusion.data.registry import get_dataset, infinite_batches
from tpu_diffusion.eval.metrics import psnr, ssim
from tpu_diffusion.losses.ddpm import get_loss_function
from tpu_diffusion.models.unet import create_model
from tpu_diffusion.sampling.ancestral import (
    make_cached_amortized_sampler, make_conditional_sampler)

TRAIN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
BATCH = 64
EVAL_BATCH = 16


def main():
    ddpm = DDPM.create(1000)
    lik = InPainting(patch_size=14, pad_value=-2.0)
    cond = Amortized(p_cond=0.9)
    model = create_model(image_size=28, num_channels=32, num_res_blocks=2,
                         in_channels=2, out_channels=1,
                         attention_resolutions="14,7",
                         use_scale_shift_norm=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 28, 28, 2)),
                                 jnp.zeros((1,)))
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    def loss_fn(params, key, batch):
        net = lambda xi, t: model.apply(params, xi, t)
        lf, _ = get_loss_function(net, ddpm, cond, lik)
        return lf(key, batch)

    @jax.jit
    def train_step(params, opt_state, key, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    train = get_dataset("mnist")("data", train=True)
    batches = infinite_batches(train, BATCH, seed=0)
    key = jax.random.PRNGKey(1)
    for step in range(TRAIN_STEPS):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, k,
                                             jnp.asarray(next(batches)))
        if step % 100 == 0 or step == TRAIN_STEPS - 1:
            print(f"[train] step {step} loss {float(loss):.4f}",
                  flush=True)

    def eps_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

    def encode_fn(xi, i):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0,
                           mode="encode")

    def decode_fn(xi, i, cache):
        return model.apply(params, xi, i.astype(jnp.float32) / 1000.0,
                           mode="decode", cache=cache)

    test = get_dataset("mnist")("data", train=False)
    imgs = jnp.asarray(test.images[:EVAL_BATCH])
    kc, kx, ks = jax.random.split(jax.random.PRNGKey(2), 3)
    condition = lik.sample(kc, imgs)
    xT = jax.random.normal(kx, imgs.shape)

    samplers = {"plain": jax.jit(make_conditional_sampler(
        eps_fn, ddpm, cond, lik))}
    for k_reuse in (2, 4):
        samplers[f"reuse{k_reuse}"] = jax.jit(make_cached_amortized_sampler(
            encode_fn, decode_fn, ddpm, cond, lik, encoder_reuse=k_reuse))

    for name, sampler in samplers.items():
        out = sampler(ks, xT, condition)
        _ = float(np.asarray(out).ravel()[0])  # compile + completion
        t0 = time.perf_counter()
        out = sampler(ks, xT, condition)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "sampler": name,
            "psnr": round(float(jnp.mean(psnr(out, imgs))), 3),
            "ssim": round(float(jnp.mean(ssim(out, imgs))), 4),
            "eval_batch_seconds": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
