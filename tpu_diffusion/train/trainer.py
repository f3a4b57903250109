"""The one training loop (replaces the reference's five: image_diffusion
trainer.py/trainer2.py, the three mnist/cifar `fit()` loops, and the
Lightning ResDiff loop for proteins — SURVEY.md L5).

Design: a pure jitted `train_step(state, batch) -> (state, metrics)` closed
over the loss, optimizer, and EMA; batch sharded over the mesh "data" axis,
state replicated (or model-sharded). The host loop only feeds batches and
fires periodic actions (checkpoint / metrics / eval / plots) — exactly the
cadence scheme of experiments/main.py:220-226.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpu_diffusion.core.ema import EMAState, ema_update
from tpu_diffusion.parallel.mesh import (batch_sharding, make_mesh,
                                         replicate, replicated, shard_batch)

Array = jax.Array
PyTree = Any
# loss(params, key, batch) -> scalar
LossFn = Callable[[PyTree, Array, Array], Array]


@struct.dataclass
class TrainState:
    step: Array            # int32 scalar
    params: PyTree
    opt_state: PyTree
    ema: EMAState
    rng: Array

    @classmethod
    def create(cls, params: PyTree, tx: optax.GradientTransformation,
               rng: Array) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), ema=EMAState.create(params),
                   rng=rng)


def make_optimizer(lr: float | optax.Schedule, warmup: int = 0,
                   grad_clip: Optional[float] = 1.0,
                   total_steps: Optional[int] = None,
                   schedule: str = "warmup") -> optax.GradientTransformation:
    """Adam + warmup (+ optional cosine decay) + global-norm clipping.

    `schedule="warmup"` is the reference CIFAR recipe (LambdaLR
    min(step/warmup, 1), train_cifar10.py:54-56,107); "warmup_cosine" is the
    experiments/main.py:228-236 SequentialLR recipe; "constant" disables.
    """
    if callable(lr):
        sched = lr
    elif schedule == "warmup_cosine":
        # checked before the warmup==0 shortcut: warmup=0 +
        # warmup_cosine means "no warmup, cosine decay still wanted" —
        # silently dropping the decay trained at constant peak LR
        assert total_steps is not None
        sched = optax.warmup_cosine_decay_schedule(
            lr if warmup == 0 else 0.0, lr, warmup,
            max(total_steps, warmup + 1))
    elif schedule == "constant" or warmup == 0:
        sched = optax.constant_schedule(lr)
    else:
        sched = lambda step: lr * jnp.minimum(
            (step + 1) / max(warmup, 1), 1.0)
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adam(sched))
    return optax.chain(*parts)


def make_train_step(loss_fn: LossFn, tx: optax.GradientTransformation,
                    ema_decay: float = 0.9999, ema_update_every: int = 1,
                    ema_update_after: int = 0,
                    ema_warmup: bool = True) -> Callable:
    """Build the pure train step; jit it (with shardings) at the call site."""

    def train_step(state: TrainState, batch: PyTree):
        rng, key = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_decay,
                         update_every=ema_update_every,
                         update_after=ema_update_after,
                         warmup=ema_warmup)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema=ema, rng=rng)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


class Trainer:
    """fit() = feed batches to the jitted step + fire periodic callbacks.

    Callbacks receive (step, state, metrics) via keyword args, mirroring
    `PeriodicCallback` usage at experiments/main.py:210-226.
    """

    def __init__(self, train_step: Callable, state: TrainState,
                 batches: Iterator, mesh=None,
                 callbacks: Optional[List[Callable]] = None,
                 donate: Optional[bool] = None,
                 tensor_parallel: bool = False):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.callbacks = callbacks or []
        if donate is None:
            # Buffer donation of the replicated state deadlocks XLA:CPU's
            # in-process all-reduce rendezvous AND raises INVALID_ARGUMENT
            # on the axon TPU backend; default off (opt back in on stock
            # Cloud TPU runtimes where donation is safe).
            donate = False
        if tensor_parallel and self.mesh.shape.get("model", 1) > 1:
            from tpu_diffusion.parallel.tp import state_shardings
            state_sh = state_shardings(self.mesh, state)
            self.state = jax.device_put(state, state_sh)
        else:
            state_sh = replicated(self.mesh)
            self.state = replicate(self.mesh, state)
        data_sh = batch_sharding(self.mesh)
        self._step_fn = jax.jit(
            train_step,
            in_shardings=(state_sh, data_sh),
            out_shardings=(state_sh, None),
            donate_argnums=(0,) if donate else (),
        )
        self._batches = batches
        self._raw_step = train_step
        self._state_sh = state_sh

    def fit(self, num_steps: int,
            metrics_hook: Optional[Callable[[int, Dict], None]] = None
            ) -> TrainState:
        t0 = time.monotonic()
        # Host-side step counter: int(self.state.step) forces a device sync
        # (blocks async dispatch on TPU), so read it once and count locally.
        step0 = int(self.state.step)
        for local_step in range(num_steps):
            batch = shard_batch(self.mesh, next(self._batches))
            self.state, metrics = self._step_fn(self.state, batch)
            step = step0 + local_step + 1
            # Only pay the device->host metric transfer on steps where some
            # consumer actually runs; otherwise leave the step in flight.
            # Each callback's decision is sampled ONCE and passed back in:
            # an every_secs deadline crossing between this preview and the
            # callback's own re-check would otherwise fire with the raw
            # device-array metrics (no steps_per_sec key).
            decisions = [getattr(cb, "should_fire", lambda s: True)(step)
                         for cb in self.callbacks]
            fire = metrics_hook is not None or any(decisions)
            if fire:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_sec"] = (local_step + 1) / (
                    time.monotonic() - t0)
            else:
                m = metrics  # device arrays; no callback will read them
            if metrics_hook is not None:
                metrics_hook(step, m)
            for cb, d in zip(self.callbacks, decisions):
                if hasattr(cb, "should_fire"):
                    cb(step, state=self.state, metrics=m, _fire=d)
                else:
                    cb(step, state=self.state, metrics=m)
        return self.state

    def fit_scanned(self, num_steps: int, sample_batch: Callable,
                    chunk: int = 100, base_key: Optional[Array] = None,
                    metrics_hook: Optional[Callable[[int, Dict], None]]
                    = None) -> TrainState:
        """TPU-native fit: `lax.scan` over `chunk` steps per dispatch with
        an on-device batch sampler — zero per-step host->device traffic.

        `fit()` pays one dispatch RPC plus a full batch transfer through
        the host tunnel every step (measured at ~0.5 s/step against the
        61 ms/step the device sustains — PERF.md round 4); here the data
        lives in HBM (`data.device_cache.stage`) and `sample_batch(key) ->
        batch` is a pure jittable function, so one dispatch covers `chunk`
        steps and the only host traffic is the per-chunk loss trace read
        (which doubles as dispatch throttling, bounding host memory).

        The per-step PRNG key is `fold_in(base_key, global_step)`, making
        the batch stream a pure function of (base_key, step) — invariant
        to `chunk` and exactly reproducible across resume boundaries
        (pinned by tests/test_trainer.py). Callbacks fire once per chunk
        with the full `loss_trace`/`grad_norm_trace` arrays in `metrics`,
        so an every-N recorder sees no coarser data than `fit()` gave it.
        """
        from tpu_diffusion.train.actions import PeriodicAction
        for cb in self.callbacks:
            if isinstance(cb, PeriodicAction):
                raise ValueError(
                    "fit_scanned() fires callbacks once per chunk, which "
                    "violates PeriodicAction's call-every-step contract — "
                    "use the metrics_hook (it receives the full per-step "
                    "loss_trace) or fit() for per-step cadence")
        if base_key is None:
            base_key = jax.random.PRNGKey(0)
        base_key = jax.device_put(base_key)
        step0 = int(self.state.step)

        def chunk_body(state, i):
            batch = sample_batch(jax.random.fold_in(base_key, i))
            state, metrics = self._raw_step(state, batch)
            return state, (metrics["loss"], metrics["grad_norm"])

        compiled = {}

        def chunk_fn(k: int):
            if k not in compiled:
                def run(state, first_step):
                    idx = first_step + jnp.arange(k, dtype=jnp.int32)
                    return jax.lax.scan(chunk_body, state, idx)
                compiled[k] = jax.jit(
                    run, in_shardings=(self._state_sh, None),
                    out_shardings=(self._state_sh, None))
            return compiled[k]

        import numpy as np
        t0 = time.monotonic()
        done = 0
        while done < num_steps:
            k = min(chunk, num_steps - done)
            self.state, (losses, gnorms) = chunk_fn(k)(
                self.state, jnp.int32(step0 + done))
            losses = np.asarray(losses)     # host read: sync + throttle
            gnorms = np.asarray(gnorms)
            done += k
            step = step0 + done
            m = {"loss": float(losses[-1]),
                 "grad_norm": float(gnorms[-1]),
                 "loss_mean": float(losses.mean()),
                 "steps_per_sec": done / (time.monotonic() - t0),
                 "loss_trace": losses, "grad_norm_trace": gnorms}
            if metrics_hook is not None:
                metrics_hook(step, m)
            for cb in self.callbacks:
                cb(step, state=self.state, metrics=m)
        return self.state
