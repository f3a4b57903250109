"""Debug / profiling / checkpoint-surgery utilities.

Covers the reference's auxiliary subsystems (SURVEY.md §5.1-5.2):
  * `enable_debug_nans` — jax.debug_nans behind a flag (the reference's
    samplers carry manual NaN-print checks, sde_diffusion.py:206-212);
  * `trace` — jax.profiler trace annotation context for train/sample steps
    (replaces the thop FLOP-counter hooks; compiled-HLO cost analysis is
    exposed by `compiled_cost`);
  * `checkify_sampler` — optional runtime invariant checks on sampler
    outputs;
  * `strip_checkpoint_keys` — the artifacts/newgvp_j/model_test.py:1-14
    checkpoint-surgery helper (drop buffers by prefix).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Iterable

import jax


def enable_debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def trace(name: str):
    """Profiler annotation: `with trace("train_step"): ...`."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile(logdir: str):
    """Capture a full profiler trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs / bytes estimates from the compiled module (replaces the
    reference's count_flops_attn hooks, unet.py:404-421)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax versions
        cost = cost[0]
    return {k: float(v) for k, v in cost.items()
            if isinstance(v, (int, float))}


def checkify_sampler(sample_fn: Callable) -> Callable:
    """Wrap a sampler with checkify NaN/inf checks (SURVEY.md §5.2)."""
    from jax.experimental import checkify

    checked = checkify.checkify(sample_fn,
                                errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def strip_checkpoint_keys(assets: Dict[str, Any],
                          prefixes: Iterable[str]) -> Dict[str, Any]:
    """Drop checkpoint entries matching any prefix: either the full
    slash-joined path starts with it ('params/schedule' removes exactly
    that subtree) or a key of that exact NAME appears at any depth (the
    reference's surgery strips buffers like 'schedule' wherever they
    live). Matching is path-component exact — 'schedule' does NOT match
    'schedule_v2'."""
    prefixes = tuple(prefixes)

    def matches(p: str, k: str) -> bool:
        return any(p == pre or p.startswith(pre + "/") or k == pre
                   for pre in prefixes)

    def prune(tree, path=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                p = f"{path}/{k}" if path else k
                if matches(p, k):
                    continue
                out[k] = prune(v, p)
            return out
        return tree

    return prune(assets)
