"""Conditional flow matching probability paths and minibatch couplings.

Rebuilds the `torchcfm` API surface the reference trains with (imported at
`cifar10/train_cifar10.py:11-16`, `mnist/train_mnist.py:28-34`; selected at
`cifar10/train_cifar10.py:126-137`):

  * `icfm`  — independent-coupling CFM (Tong et al.),
  * `otcfm` — exact minibatch-OT coupling,
  * `fm`    — Lipman et al. target flow matching,
  * `si`    — variance-preserving stochastic interpolant,
  * `sbcfm` — Schrödinger-bridge CFM (flow + score), used by
              `conditional_mnist.ipynb`'s SF2M path.

All matchers expose
    sample_location_and_conditional_flow(key, x0, x1) -> (t, x_t, u_t)
as batched pure functions on NHWC (or any-rank) arrays.

TPU notes: the exact OT coupling is a host combinatorial solve
(`scipy.optimize.linear_sum_assignment` — for uniform minibatch marginals the
exact OT plan is a permutation, so LSA == emd). Three ways to run it:

  * `host_ot_pairs` — pair (noise, data) on the host *between* steps and
    feed (x0, x1) tuples to the train step: the TPU-recommended path, no
    callbacks inside jit (the reference's POT plan is host-side too);
  * `exact_ot_permutation` — inside jit via `jax.pure_callback` (CPU/GPU
    only; unsupported on some TPU runtimes);
  * `sinkhorn_assignment` — on-device entropic OT, never leaves the chip.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


def _pad_t(t: Array, ndim: int) -> Array:
    return t.reshape(t.shape + (1,) * (ndim - t.ndim))


@struct.dataclass
class ConditionalFlowMatcher:
    """I-CFM: straight path between independently coupled (x0, x1).

    mu_t = t x1 + (1-t) x0,  sigma_t = sigma,  u_t = x1 - x0.
    """

    sigma: float = 0.0

    def sample_t(self, key: Array, batch: int) -> Array:
        return jax.random.uniform(key, (batch,))

    def compute_mu_t(self, x0: Array, x1: Array, t: Array) -> Array:
        t = _pad_t(t, x0.ndim)
        return t * x1 + (1 - t) * x0

    def compute_sigma_t(self, t: Array) -> Array:
        return jnp.full_like(t, self.sigma)

    def compute_conditional_flow(self, x0: Array, x1: Array, t: Array,
                                 xt: Array) -> Array:
        del t, xt
        return x1 - x0

    def sample_xt(self, key: Array, x0: Array, x1: Array,
                  t: Array) -> Array:
        mu = self.compute_mu_t(x0, x1, t)
        sig = _pad_t(self.compute_sigma_t(t), x0.ndim)
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        return mu + sig * eps

    def sample_location_and_conditional_flow(
            self, key: Array, x0: Array, x1: Array,
            t: Array | None = None) -> Tuple[Array, Array, Array]:
        kt, kx = jax.random.split(key)
        if t is None:
            t = self.sample_t(kt, x0.shape[0])
        xt = self.sample_xt(kx, x0, x1, t)
        ut = self.compute_conditional_flow(x0, x1, t, xt)
        return t, xt, ut

    def sample_location_and_conditional_flow_with_eps(
            self, key: Array, x0: Array, x1: Array,
            t: Array | None = None
    ) -> Tuple[Array, Array, Array, Array]:
        """Also return the path noise eps (needed by the SF2M score head,
        used in conditional_mnist.ipynb cells 9-11)."""
        kt, kx = jax.random.split(key)
        if t is None:
            t = self.sample_t(kt, x0.shape[0])
        mu = self.compute_mu_t(x0, x1, t)
        sig = _pad_t(self.compute_sigma_t(t), x0.ndim)
        eps = jax.random.normal(kx, x0.shape, x0.dtype)
        xt = mu + sig * eps
        ut = self.compute_conditional_flow(x0, x1, t, xt)
        return t, xt, ut, eps

    def guided_sample_location_and_conditional_flow(
            self, key: Array, x0: Array, x1: Array, y1: Array,
            t: Array | None = None
    ) -> Tuple[Array, Array, Array, Array]:
        """Class-guided variant: labels ride along with x1 (torchcfm's
        guided_* used by conditional_mnist.ipynb). Couplings that reorder
        x1 reorder y1 identically."""
        t, xt, ut = self.sample_location_and_conditional_flow(key, x0, x1,
                                                              t)
        return t, xt, ut, y1


@struct.dataclass
class TargetConditionalFlowMatcher(ConditionalFlowMatcher):
    """Lipman et al. flow matching toward a standard-normal source.

    mu_t = t x1,  sigma_t = 1 - (1 - sigma) t,
    u_t = (x1 - (1 - sigma) x_t) / (1 - (1 - sigma) t).
    """

    def compute_mu_t(self, x0: Array, x1: Array, t: Array) -> Array:
        del x0
        return _pad_t(t, x1.ndim) * x1

    def compute_sigma_t(self, t: Array) -> Array:
        return 1.0 - (1.0 - self.sigma) * t

    def compute_conditional_flow(self, x0: Array, x1: Array, t: Array,
                                 xt: Array) -> Array:
        del x0
        t = _pad_t(t, x1.ndim)
        return (x1 - (1.0 - self.sigma) * xt) / (1.0 - (1.0 - self.sigma) * t)


@struct.dataclass
class VariancePreservingConditionalFlowMatcher(ConditionalFlowMatcher):
    """Trig stochastic interpolant (Albergo & Vanden-Eijnden).

    mu_t = cos(pi t / 2) x0 + sin(pi t / 2) x1,
    u_t = pi/2 (cos(pi t / 2) x1 - sin(pi t / 2) x0).
    """

    def compute_mu_t(self, x0: Array, x1: Array, t: Array) -> Array:
        t = _pad_t(t, x0.ndim)
        a = math.pi / 2 * t
        return jnp.cos(a) * x0 + jnp.sin(a) * x1

    def compute_conditional_flow(self, x0: Array, x1: Array, t: Array,
                                 xt: Array) -> Array:
        del xt
        t = _pad_t(t, x0.ndim)
        a = math.pi / 2 * t
        return math.pi / 2 * (jnp.cos(a) * x1 - jnp.sin(a) * x0)


# ---------------------------------------------------------------------------
# Minibatch couplings
# ---------------------------------------------------------------------------


def _lsa_permutation(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment
    _, col = linear_sum_assignment(cost)
    return col.astype(np.int32)


def exact_ot_permutation(x0: Array, x1: Array) -> Array:
    """Exact OT assignment between uniform minibatches (host callback).

    Returns the permutation `p` minimizing sum_i ||x0[i] - x1[p[i]]||^2.
    Equivalent to the reference's `pot.emd`-based OTPlanSampler for uniform
    marginals (the optimal plan is then a permutation matrix).
    """
    b = x0.shape[0]
    f0 = x0.reshape(b, -1).astype(jnp.float32)
    f1 = x1.reshape(b, -1).astype(jnp.float32)
    cost = (jnp.sum(f0**2, -1)[:, None] + jnp.sum(f1**2, -1)[None, :]
            - 2.0 * f0 @ f1.T)
    return jax.pure_callback(
        _lsa_permutation,
        jax.ShapeDtypeStruct((b,), jnp.int32),
        cost,
        vmap_method="sequential",
    )


def numpy_ot_permutation(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    """Exact OT assignment computed entirely on the host (numpy + scipy).

    Same permutation as `exact_ot_permutation`, but callable from plain
    Python — used by `host_ot_pairs` to pair batches *outside* the jitted
    train step.
    """
    b = x0.shape[0]
    f0 = np.asarray(x0, np.float32).reshape(b, -1)
    f1 = np.asarray(x1, np.float32).reshape(b, -1)
    cost = ((f0**2).sum(1)[:, None] + (f1**2).sum(1)[None, :]
            - 2.0 * f0 @ f1.T)
    return _lsa_permutation(cost)


def host_ot_pairs(batches, seed: int = 0, prefetch: int = 2):
    """Wrap a data-batch iterator with host-side exact-OT noise pairing.

    Yields (x0, x1[perm]) tuples where x0 ~ N(0, I) and perm is the exact
    minibatch-OT assignment. This is the TPU-safe OT-CFM recipe: the
    combinatorial solve runs on host between steps (the reference's POT
    `emd` plan is host-side too — cifar10/train_cifar10.py:147), so the
    jitted train step stays a pure on-device program with no callbacks
    (`jax.pure_callback` is unsupported on some TPU runtimes). Feed the
    pairs to a loss built with `make_cfm_loss_fn(..., paired=True)` over an
    I-CFM matcher — after pairing, OT-CFM *is* I-CFM on the paired batch.

    `prefetch` > 0 computes that many paired batches ahead on a background
    thread, overlapping the O(b^3) assignment solve (cost matmul + LSA)
    with the device step so OT-CFM step time tracks I-CFM step time
    (measured in PERF.md); `prefetch=0` pairs synchronously in the caller's
    thread.
    """

    def paired():
        rng = np.random.default_rng(seed)
        for x1 in batches:
            x1 = np.asarray(x1)
            x0 = rng.standard_normal(x1.shape).astype(np.float32)
            perm = numpy_ot_permutation(x0, x1)
            yield x0, x1[perm]

    if prefetch <= 0:
        yield from paired()
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put_or_stop(msg) -> bool:
        # bounded put with a stop check: when the consumer abandons the
        # generator (trainer done, early break) the worker must exit
        # instead of blocking on a full queue forever, pinning the source
        # iterator and computing O(b^3) solves for nobody. Applies to the
        # terminal ("end"/"err") puts too — an exhausted source with a
        # full queue would otherwise leak the thread the same way.
        while not stop.is_set():
            try:
                q.put(msg, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in paired():
                if not put_or_stop(("data", item)):
                    return
            put_or_stop(("end", None))
        except BaseException as e:  # surface worker failures in the consumer
            put_or_stop(("err", e))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            tag, item = q.get()
            if tag == "err":
                raise item
            if tag == "end":
                return
            yield item
    finally:
        stop.set()  # GeneratorExit / normal return: shut the worker down


def sinkhorn_assignment(x0: Array, x1: Array, reg: float = 0.05,
                        num_iters: int = 50, key: Array | None = None
                        ) -> Array:
    """On-device entropic OT: returns, per row, a sampled (or argmax) column.

    Runs entirely on TPU — no host round trip — at the cost of entropic bias.
    Cost matrix is normalized by its max for scale-free regularization.
    """
    b = x0.shape[0]
    f0 = x0.reshape(b, -1).astype(jnp.float32)
    f1 = x1.reshape(b, -1).astype(jnp.float32)
    cost = (jnp.sum(f0**2, -1)[:, None] + jnp.sum(f1**2, -1)[None, :]
            - 2.0 * f0 @ f1.T)
    cost = cost / (jnp.max(jnp.abs(cost)) + 1e-8)
    logk = -cost / reg
    logu = jnp.zeros((b,))
    logv = jnp.zeros((b,))
    log_marg = -math.log(b)

    def body(_, carry):
        logu, logv = carry
        logu = log_marg - jax.nn.logsumexp(logk + logv[None, :], axis=1)
        logv = log_marg - jax.nn.logsumexp(logk + logu[:, None], axis=0)
        return logu, logv

    logu, logv = jax.lax.fori_loop(0, num_iters, body, (logu, logv))
    logp = logk + logu[:, None] + logv[None, :]
    if key is None:
        return jnp.argmax(logp, axis=1).astype(jnp.int32)
    return jax.random.categorical(key, logp, axis=1).astype(jnp.int32)


@struct.dataclass
class ExactOptimalTransportConditionalFlowMatcher(ConditionalFlowMatcher):
    """OT-CFM: reorder the minibatch by the exact OT plan, then I-CFM.

    `method="exact"` matches the reference protocol (host LSA through
    `pure_callback`); `method="sinkhorn"` stays on-device.
    """

    method: str = struct.field(pytree_node=False, default="exact")
    reg: float = struct.field(pytree_node=False, default=0.05)

    def pair(self, key: Array, x0: Array, x1: Array) -> Tuple[Array, Array]:
        if self.method == "exact":
            perm = exact_ot_permutation(x0, x1)
        else:
            perm = sinkhorn_assignment(x0, x1, reg=self.reg, key=key)
        return x0, jnp.take(x1, perm, axis=0)

    def sample_location_and_conditional_flow(
            self, key: Array, x0: Array, x1: Array,
            t: Array | None = None) -> Tuple[Array, Array, Array]:
        kp, kr = jax.random.split(key)
        x0, x1 = self.pair(kp, x0, x1)
        return super().sample_location_and_conditional_flow(kr, x0, x1, t)

    def guided_sample_location_and_conditional_flow(
            self, key: Array, x0: Array, x1: Array, y1: Array,
            t: Array | None = None
    ) -> Tuple[Array, Array, Array, Array]:
        kp, kr = jax.random.split(key)
        if self.method == "exact":
            perm = exact_ot_permutation(x0, x1)
        else:
            perm = sinkhorn_assignment(x0, x1, reg=self.reg, key=kp)
        x1 = jnp.take(x1, perm, axis=0)
        y1 = jnp.take(y1, perm, axis=0)
        t, xt, ut = ConditionalFlowMatcher.sample_location_and_conditional_flow(
            self, kr, x0, x1, t)
        return t, xt, ut, y1


@struct.dataclass
class SchrodingerBridgeConditionalFlowMatcher(ConditionalFlowMatcher):
    """SB-CFM / SF2M (entropic-OT coupling + Brownian-bridge path).

    sigma_t = sigma sqrt(t (1 - t));
    u_t = (1 - 2t) / (2 t (1-t)) (x_t - mu_t) + x1 - x0.
    Also exposes `compute_lambda` for the score head of the SF2M objective
    (used by `conditional_mnist.ipynb` cells 9-11).
    """

    sigma: float = 1.0
    reg: float = struct.field(pytree_node=False, default=0.05)

    def compute_sigma_t(self, t: Array) -> Array:
        return self.sigma * jnp.sqrt(t * (1.0 - t))

    def compute_conditional_flow(self, x0: Array, x1: Array, t: Array,
                                 xt: Array) -> Array:
        tb = _pad_t(t, x0.ndim)
        mu = self.compute_mu_t(x0, x1, t)
        bridge = (1.0 - 2.0 * tb) / (2.0 * tb * (1.0 - tb) + 1e-8) * (xt - mu)
        return bridge + x1 - x0

    def compute_lambda(self, t: Array) -> Array:
        sig = self.compute_sigma_t(t)
        return 2.0 * sig / (self.sigma**2 + 1e-8)

    def sample_location_and_conditional_flow(
            self, key: Array, x0: Array, x1: Array,
            t: Array | None = None) -> Tuple[Array, Array, Array]:
        kp, kr = jax.random.split(key)
        perm = sinkhorn_assignment(x0, x1, reg=2 * self.sigma**2, key=kp)
        x1 = jnp.take(x1, perm, axis=0)
        return super().sample_location_and_conditional_flow(kr, x0, x1, t)

    def sample_location_and_conditional_flow_with_eps(
            self, key: Array, x0: Array, x1: Array,
            t: Array | None = None
    ) -> Tuple[Array, Array, Array, Array]:
        kp, kr = jax.random.split(key)
        perm = sinkhorn_assignment(x0, x1, reg=2 * self.sigma**2, key=kp)
        x1 = jnp.take(x1, perm, axis=0)
        return super().sample_location_and_conditional_flow_with_eps(
            kr, x0, x1, t)


MATCHERS = {
    "icfm": ConditionalFlowMatcher,
    "otcfm": ExactOptimalTransportConditionalFlowMatcher,
    "fm": TargetConditionalFlowMatcher,
    "si": VariancePreservingConditionalFlowMatcher,
    "sbcfm": SchrodingerBridgeConditionalFlowMatcher,
}


def get_matcher(name: str, sigma: float = 0.0, **kw) -> ConditionalFlowMatcher:
    """Factory matching the reference's selection block
    (cifar10/train_cifar10.py:126-137)."""
    if name not in MATCHERS:
        raise NotImplementedError(
            f"Unknown matcher {name!r}; expected one of {sorted(MATCHERS)}")
    if name == "sbcfm" and sigma <= 0:
        # torchcfm raises the same way: the Schrödinger-bridge coupling's
        # sinkhorn regularization is 2*sigma^2 — sigma=0 divides the cost
        # matrix by zero and silently corrupts every pairing
        raise ValueError(
            f"sbcfm requires sigma > 0 (got {sigma}); the entropic OT "
            f"coupling uses reg = 2*sigma^2")
    return MATCHERS[name](sigma=sigma, **kw)


def cfm_loss(vt: Array, ut: Array) -> Array:
    """The CFM regression objective mean((v - u)^2)
    (cifar10/train_cifar10.py:148-149)."""
    return jnp.mean((vt - ut) ** 2)
