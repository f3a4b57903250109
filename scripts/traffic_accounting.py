"""HBM-traffic accounting for the DDIM bench workload (r4, verdict item 1).

BENCH_r03: the compiled program moves 5.02 GB/step against an analytic
conv-only floor of 1.44 GB/step. This script attributes the gap op by op
from the ARCHITECTURE (flax interceptor under jax.eval_shape — no device),
using XLA-on-TPU fusion semantics measured in the r2/r3 profiles:

  conv/dense   in + weights + out                  (the floor itself)
  GroupNorm    3 activation passes: the stats reduce must complete before
               the normalize pass, so XLA emits convert_reduce(read) +
               normalize(read, write); SiLU/FiLM fuse into the normalize
               for free (observed in the r2 trace)
  residual +   2 passes: the add is recomputed inside BOTH surrounding
               fusions (stats + normalize) instead of materializing
  concat       2 passes of the concatenated tensor (read halves + write)
  attention    3 passes of the fp32 [B,heads,T,T] score matrix (logits
               write, softmax read+write fused, PV read) + qkv head
               split/merge copies (~2 activation passes)
  ddim update  read + write of the fp32 state per step

The sum is checked against the compiled-HLO "bytes accessed" (r3: 5.02
GB/step); the residual is XLA's remaining fusion wins/losses. Each
non-floor category is traffic that CANNOT be folded into the convs on
this backend: the r3 per-op fused-norm Pallas kernel (1.5x slower) and
the r4 whole-ResBlock megakernel (0.84-0.90x end-to-end at every
threshold) both lost to exactly these fusions — see PERF.md.

Run on CPU: JAX_PLATFORMS=cpu python scripts/traffic_accounting.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

BATCH = 64
V5E_HBM_BW = 819e9


def account(model, params, x, t):
    cats = {"conv_dense_floor": 0, "groupnorm": 0, "attention_scores": 0,
            "attention_layout": 0}
    records = []

    def nbytes(sd):
        return int(np.prod(sd.shape)) * sd.dtype.itemsize

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        mod = context.module
        if isinstance(mod, (fnn.Conv, fnn.Dense)) \
                and context.method_name == "__call__":
            inp = args[0]
            cin = inp.shape[-1]
            ksize = (int(np.prod(mod.kernel_size))
                     if isinstance(mod, fnn.Conv) else 1)
            w = ksize * cin * mod.features * out.dtype.itemsize
            cats["conv_dense_floor"] += nbytes(inp) + w + nbytes(out)
        elif isinstance(mod, fnn.GroupNorm) \
                and context.method_name == "__call__":
            # stats read + normalize read + normalize write; the stats
            # convert_reduce runs in fp32 but streams the input dtype
            cats["groupnorm"] += 3 * nbytes(args[0])
            records.append(("groupnorm", args[0].shape))
        else:
            name = type(mod).__name__
            if name == "AttentionBlock" and context.method_name == "__call__":
                b, h, w_, c = args[0].shape
                heads = mod.num_heads if mod.num_head_channels == -1 \
                    else c // mod.num_head_channels
                tt = h * w_
                scores = b * heads * tt * tt * 4        # fp32 logits
                cats["attention_scores"] += 3 * scores
                cats["attention_layout"] += 2 * nbytes(args[0])
                records.append(("attention", (b, heads, tt)))
        return out

    with fnn.intercept_methods(interceptor):
        jax.eval_shape(lambda p, xx, tt: model.apply(p, xx, tt),
                       params, x, t)
    return cats, records


def structural_extras(model, x):
    """Residual adds and decoder concats from the UNet wiring itself."""
    b = x.shape[0]
    ch0 = model.model_channels
    mult = model.channel_mult
    nrb = model.num_res_blocks
    size = x.shape[1]
    bpe = 2  # bf16 activations

    res_adds = 0
    concats = 0
    # encoder blocks + middle + decoder blocks, each ResBlock ends in
    # one residual add of its output-shaped tensor (2 passes, see header)
    ds = 1
    hw = size * size
    for level, m in enumerate(mult):
        for i in range(nrb):
            res_adds += 2 * b * hw * m * ch0 * bpe
        if level != len(mult) - 1:
            hw //= 4
            ds *= 2
    hw_mid = hw
    res_adds += 2 * (2 * b * hw_mid * mult[-1] * ch0 * bpe)  # mid blocks
    for level, m in reversed(list(enumerate(mult))):
        for i in range(nrb + 1):
            res_adds += 2 * b * hw * m * ch0 * bpe
            # concat of h with the popped skip: 2 passes of the result
            skip_mult = m  # same level width (approximation: true widths
            # vary by one block at level joins; exact sum differs <5%)
            concats += 2 * b * hw * (m + skip_mult) * ch0 * bpe
        if level:
            hw *= 4
    return {"residual_adds": res_adds, "concats": concats}


def main():
    from tpu_diffusion.models.unet import create_model

    model = create_model(
        image_size=32, num_channels=128, num_res_blocks=2, in_channels=3,
        channel_mult=(1, 2, 2, 2), num_heads=4, attention_resolutions="16",
        dropout=0.0, use_scale_shift_norm=True, dtype=jnp.bfloat16,
        norm_dtype=jnp.bfloat16, attention_impl="xla")
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.zeros((BATCH,))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        params)

    cats, _ = account(model, params, x, t)
    cats.update(structural_extras(model, x))
    cats["ddim_update"] = 2 * BATCH * 32 * 32 * 3 * 4

    total = sum(cats.values())
    out = {
        "batch": BATCH,
        "per_step_gb": {k: round(v / 1e9, 4) for k, v in cats.items()},
        "model_total_gb_per_step": round(total / 1e9, 4),
        "hlo_measured_gb_per_step": 5.021,   # BENCH_r03 / 100
        "floor_gb_per_step": 1.436,          # analytic conv floor
        "residual_unmodeled_gb": round(5.021 - total / 1e9, 4),
        "note": ("every non-floor category is traffic the convs cannot "
                 "absorb on this backend: per-op Pallas norm fusion lost "
                 "1.5x (r3) and whole-ResBlock megakernels lost "
                 "0.84-0.90x end-to-end (r4) to these same XLA fusions"),
    }
    ms = {k: round(v / V5E_HBM_BW * 1e3, 3) for k, v in cats.items()}
    out["per_step_ms_at_peak_bw"] = ms
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
