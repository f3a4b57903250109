"""Does removing the attention head split/merge transposes help on the v5e?

The DDIM profile (PERF.md) attributes ~9% of step time to copy/layout ops,
partly the [b,T,3,heads,d] -> [b,heads,T,d] transposes around the attention
einsums. Hypothesis: einsum with the heads axis in place
("bqhd,bkhd->bhqk" / "bhqk,bkhd->bqhd") lets XLA fold the layout change
into the matmul and skip the explicit copies.

Measures both layouts end-to-end (qkv tensor in, merged [b,T,c] out) with
marginal scan timing at the bench config's attention shape
(b=64, T=256, heads=4, d=32) and the SR shapes.

NOTE: needs a generous budget — ~8 scan programs compile through the axon
tunnel at ~60-90 s each (run with `timeout 1200`+). Shelved as a lever in
round 2: the whole copy/layout category is 9% of DDIM step time (PERF.md),
bounding any win below ~5%.
"""
import json
import time

import jax
import jax.numpy as jnp


def _timed_scalar(fn, *args, reps=3):
    _ = float(fn(*args))
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[reps // 2]


def marginal(make_body, qkv, est_s):
    span = max(16, min(10000, int(0.1 / est_s)))
    k1 = max(2, span // 16)

    def prog(inner):
        def run(x):
            def body(c, _):
                o = make_body(c)  # [b, T, c]; carry is [b, T, 3c]
                o3 = jnp.concatenate([o, o, o], axis=-1)
                return c + 1e-6 * o3.astype(c.dtype), ()
            out, _ = jax.lax.scan(body, x, None, length=inner)
            return out.astype(jnp.float32).sum()
        return jax.jit(run)

    t1 = _timed_scalar(prog(k1), qkv)
    t2 = _timed_scalar(prog(k1 + span), qkv)
    return (t2 - t1) / span


def transposed(qkv, b, t, heads, d):
    c = heads * d
    q, k, v = jnp.split(qkv.reshape(b, t, 3, heads, d)
                        .transpose(2, 0, 3, 1, 4), 3, axis=0)
    q, k, v = q[0], k[0], v[0]
    scale = d ** -0.5
    logits = jnp.einsum("bhtd,bhsd->bhts", q * scale, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(b, t, c)


def in_place(qkv, b, t, heads, d):
    c = heads * d
    r = qkv.reshape(b, t, 3, heads, d)
    q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]  # [b, T, heads, d]
    scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)


def main():
    for b, t, heads, d in ((64, 256, 4, 32), (16, 1024, 4, 32),
                           (4, 4096, 4, 64)):
        qkv = jax.random.normal(jax.random.PRNGKey(0),
                                (b, t, 3 * heads * d), jnp.bfloat16)
        est = 4 * b * heads * t * t * d / (0.05 * 394e12)
        row = {"b": b, "T": t}
        for name, fn in (("transposed", transposed), ("in_place", in_place)):
            dt = marginal(lambda x, f=fn: f(x, b, t, heads, d), qkv, est)
            row[f"{name}_us"] = round(dt * 1e6, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
