"""Export a long-horizon TrainState checkpoint into the layout
`cli/compute_fid.py` restores ({params, ema, step} under
<input_dir>/<model>/ckpt) so the reference 50k-image FID protocol can run
against it (r3 verdict item 2).

Usage:
  python scripts/export_for_fid.py --src results_long_horizon \
      --dst results_long_horizon_export --model otcfm
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="results_long_horizon")
    p.add_argument("--dst", default="results_long_horizon_export")
    p.add_argument("--model", default="otcfm")
    p.add_argument("--num_channel", type=int, default=128)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # pure host copy, no TPU
    import jax.numpy as jnp
    import numpy as np

    from tpu_diffusion.cli.train_cifar10 import build_model
    from tpu_diffusion.train.checkpoint import CheckpointManager
    from tpu_diffusion.train.trainer import TrainState, make_optimizer

    model = build_model(num_channels=args.num_channel)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1,)), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    tx = make_optimizer(1e-4, warmup=10, grad_clip=1.0, schedule="warmup")
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))

    src = CheckpointManager(os.path.join(args.src, "ckpt"))
    assets, step = src.load({"state": state})
    state = assets["state"]
    step = int(state.step)
    assert step > 0, f"no checkpoint under {args.src}/ckpt"

    dst = CheckpointManager(os.path.join(args.dst, args.model, "ckpt"),
                            maximum=1)
    dst.save(step, jax.tree.map(np.asarray, {
        "params": state.params, "ema": state.ema.params, "step": step}))
    print(f"[export_for_fid] step {step}: {args.src} -> "
          f"{args.dst}/{args.model}/ckpt")


if __name__ == "__main__":
    main()
