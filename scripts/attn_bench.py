"""Flash-attention (Pallas) vs XLA dense attention on the real TPU.

Measures fwd and fwd+bwd time at the token counts of this framework's
configs: T=256 (CIFAR 16x16), T=1024 (64x64 SR at /2), T=4096 (256x256 SR
at /4).

Timing method (required on the axon backend — see PERF.md): a plain
`block_until_ready` does NOT block to completion through the tunnel, and a
blocking host read costs ~28 ms fixed, so each op is timed as the MARGINAL
cost between two in-program `lax.scan` repetition counts with a scalar-sum
output forced to host:

    t_op = (T(inner=K2) - T(inner=K1)) / (K2 - K1)

This cancels both the fixed round-trip and the program prologue.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp

from tpu_diffusion.kernels.attention import (flash_attention,
                                             reference_attention)

BH, D = 32, 64


def _scan_program(op, inner, grad):
    def run(q, k, v):
        if grad:
            def loss(q, k, v):
                return jnp.sum(op(q, k, v).astype(jnp.float32) ** 2)

            def body(c, _):
                g = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
                return c + 1e-6 * g[0].astype(c.dtype), ()
        else:
            def body(c, _):
                return c + 1e-6 * op(c, k, v).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=inner)
        return out.astype(jnp.float32).sum()
    return jax.jit(run)

def _timed_scalar(fn, *args, reps=3):
    _ = float(fn(*args))            # compile + warm
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(fn(*args))        # host read forces true completion
        times.append(time.perf_counter() - t0)
    return sorted(times)[reps // 2]


def marginal_time(op, q, k, v, t, grad=False):
    """Span sized so the marginal work is ~100 ms >> fixed-cost noise."""
    est = 4 * BH * t * t * D * (3 if grad else 1) / (0.05 * 394e12)
    span = max(16, min(10000, int(0.1 / est)))
    k1 = max(2, span // 16)
    t1 = _timed_scalar(_scan_program(op, k1, grad), q, k, v)
    t2 = _timed_scalar(_scan_program(op, k1 + span, grad), q, k, v)
    return (t2 - t1) / span


def main():
    for t in (256, 1024, 4096):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (BH, t, D), jnp.bfloat16)
                   for kk in ks)
        row = {"T": t}
        for name, op in (("pallas", functools.partial(flash_attention,
                                                      block_q=256)),
                         ("xla", reference_attention)):
            try:
                dt = marginal_time(op, q, k, v, t)
                row[f"{name}_fwd_us"] = round(dt * 1e6, 1)
                dtg = marginal_time(op, q, k, v, t, grad=True)
                row[f"{name}_fwdbwd_us"] = round(dtg * 1e6, 1)
            except Exception as e:  # OOM at T=4096 dense, most likely
                row[f"{name}_error"] = type(e).__name__
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
