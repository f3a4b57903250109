"""Tests of the CFM matcher family (torchcfm-equivalent API)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.losses.cfm import (ConditionalFlowMatcher,
                                      ExactOptimalTransportConditionalFlowMatcher,
                                      SchrodingerBridgeConditionalFlowMatcher,
                                      TargetConditionalFlowMatcher,
                                      VariancePreservingConditionalFlowMatcher,
                                      cfm_loss, exact_ot_permutation,
                                      get_matcher, sinkhorn_assignment)


def _data(key, b=32, shape=(4,)):
    k0, k1 = jax.random.split(key)
    return (jax.random.normal(k0, (b,) + shape),
            jax.random.normal(k1, (b,) + shape) + 2.0)


def test_icfm_path_endpoints():
    fm = ConditionalFlowMatcher(sigma=0.0)
    x0, x1 = _data(jax.random.PRNGKey(0))
    t = jnp.zeros(32)
    _, xt, ut = fm.sample_location_and_conditional_flow(
        jax.random.PRNGKey(1), x0, x1, t=t)
    np.testing.assert_allclose(xt, x0, atol=1e-6)
    np.testing.assert_allclose(ut, x1 - x0, atol=1e-6)
    t = jnp.ones(32)
    _, xt, _ = fm.sample_location_and_conditional_flow(
        jax.random.PRNGKey(2), x0, x1, t=t)
    np.testing.assert_allclose(xt, x1, atol=1e-6)


def test_icfm_sigma_adds_noise():
    fm = ConditionalFlowMatcher(sigma=0.5)
    x0 = jnp.zeros((4096, 1))
    x1 = jnp.zeros((4096, 1))
    t = jnp.full((4096,), 0.5)
    _, xt, _ = fm.sample_location_and_conditional_flow(
        jax.random.PRNGKey(0), x0, x1, t=t)
    assert abs(float(xt.std()) - 0.5) < 0.03


def test_lipman_fm_marginal_consistency():
    """u_t must transport the conditional Gaussian path: check that
    d mu_t/dt == E[u_t | t] at xt = mu_t."""
    fm = TargetConditionalFlowMatcher(sigma=0.01)
    x1 = jnp.array([[2.0]])
    t = jnp.array([0.4])
    mu = fm.compute_mu_t(None, x1, t)
    ut = fm.compute_conditional_flow(None, x1, t, mu)
    # at xt = t x1: u = (x1 - (1-s) t x1)/(1 - (1-s)t)
    s = 0.01
    want = (2.0 - (1 - s) * 0.4 * 2.0) / (1 - (1 - s) * 0.4)
    np.testing.assert_allclose(ut[0, 0], want, rtol=1e-5)


def test_vp_si_flow_is_path_derivative():
    """For the trig interpolant, u_t(mu_t) == d mu_t / dt (autodiff check)."""
    fm = VariancePreservingConditionalFlowMatcher(sigma=0.0)
    x0 = jnp.array([[1.0]])
    x1 = jnp.array([[-0.5]])

    def mu(tv):
        return fm.compute_mu_t(x0, x1, jnp.array([tv]))[0, 0]

    t = 0.3
    want = jax.grad(mu)(t)
    got = fm.compute_conditional_flow(x0, x1, jnp.array([t]), None)[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_exact_ot_permutation_recovers_identity():
    """When x1 is a shuffled copy of x0, exact OT must unshuffle it."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (16, 8)) * 10
    perm = jax.random.permutation(jax.random.PRNGKey(1), 16)
    x1 = x0[perm]
    assignment = exact_ot_permutation(x0, x1)
    np.testing.assert_array_equal(np.asarray(x1)[np.asarray(assignment)],
                                  np.asarray(x0))


def test_otcfm_reduces_transport_cost():
    fm = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)
    x0, x1 = _data(jax.random.PRNGKey(3), b=64, shape=(6,))
    _, x1p = fm.pair(jax.random.PRNGKey(4), x0, x1)
    naive = float(jnp.sum((x0 - x1) ** 2))
    paired = float(jnp.sum((x0 - x1p) ** 2))
    assert paired <= naive + 1e-4
    # pairing is a permutation
    np.testing.assert_allclose(np.sort(np.asarray(x1p), axis=0),
                               np.sort(np.asarray(x1), axis=0), atol=1e-6)


def test_otcfm_inside_jit():
    """The host-callback OT pairing must compose with jit."""
    fm = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)

    @jax.jit
    def step(key, x0, x1):
        t, xt, ut = fm.sample_location_and_conditional_flow(key, x0, x1)
        return cfm_loss(xt, ut)

    x0, x1 = _data(jax.random.PRNGKey(5), b=8)
    val = step(jax.random.PRNGKey(6), x0, x1)
    assert np.isfinite(float(val))


def test_sinkhorn_assignment_near_identity():
    x0 = jnp.eye(8) * 10
    perm = jnp.array([3, 1, 4, 0, 7, 2, 6, 5])
    x1 = x0[perm]
    a = sinkhorn_assignment(x0, x1, reg=0.01, num_iters=200)
    np.testing.assert_array_equal(np.asarray(x1)[np.asarray(a)],
                                  np.asarray(x0))


def test_sbcfm_bridge_noise_vanishes_at_endpoints():
    fm = SchrodingerBridgeConditionalFlowMatcher(sigma=1.0)
    t = jnp.array([0.0, 0.5, 1.0])
    sig = fm.compute_sigma_t(t)
    np.testing.assert_allclose(sig, [0.0, 0.5, 0.0], atol=1e-6)


def test_get_matcher_factory():
    for name in ["icfm", "otcfm", "fm", "si", "sbcfm"]:
        m = get_matcher(name, sigma=0.1)
        assert hasattr(m, "sample_location_and_conditional_flow")
    with pytest.raises(NotImplementedError):
        get_matcher("nope")


def test_host_ot_pairs_matches_callback_permutation():
    # Host-side pairing (the TPU exact-OT path) must apply the same exact-OT
    # assignment as the in-jit pure_callback path.
    from tpu_diffusion.losses.cfm import (exact_ot_permutation, host_ot_pairs,
                                          numpy_ot_permutation)
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((16, 4, 4, 1)).astype(np.float32)

    pairs = list(host_ot_pairs(iter([x1]), seed=7))
    assert len(pairs) == 1
    x0, x1p = pairs[0]
    assert x0.shape == x1.shape
    # x1p is x1 reordered by the exact plan against that x0
    perm = numpy_ot_permutation(x0, x1)
    np.testing.assert_array_equal(x1p, x1[perm])
    # and numpy_ot_permutation == the jax-callback solver
    perm_jax = np.asarray(exact_ot_permutation(jnp.asarray(x0),
                                               jnp.asarray(x1)))
    np.testing.assert_array_equal(perm, perm_jax)
    # pairing reduces transport cost vs identity coupling
    cost_paired = float(((x0 - x1p) ** 2).sum())
    cost_id = float(((x0 - x1) ** 2).sum())
    assert cost_paired <= cost_id + 1e-5


def test_host_ot_pairs_worker_stops_when_abandoned():
    # The prefetch worker must terminate when the consumer abandons the
    # generator — otherwise it blocks on the full queue forever, pinning
    # the source iterator and computing assignments for nobody.
    import threading
    import time

    from tpu_diffusion.losses.cfm import host_ot_pairs

    consumed = []

    def endless():
        rng = np.random.default_rng(1)
        while True:
            consumed.append(1)
            yield rng.standard_normal((8, 2, 2, 1)).astype(np.float32)

    before = threading.active_count()
    gen = host_ot_pairs(endless(), seed=3, prefetch=2)
    next(gen)
    gen.close()  # GeneratorExit -> stop flag
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    n = len(consumed)
    time.sleep(0.3)
    assert len(consumed) == n  # source iterator no longer being drained


@pytest.mark.slow
def test_paired_cfm_loss_trains_one_step():
    # The otcfm --ot_method exact recipe: host pairs feed a jitted step
    # that contains no callbacks (runs on any backend).
    from tpu_diffusion.cli.train_cifar10 import make_cfm_loss_fn
    from tpu_diffusion.models.unet import UNetModelWrapper

    model = UNetModelWrapper(dim=(8, 8, 1), num_channels=8,
                             num_res_blocks=1, channel_mult=(1, 2),
                             num_heads=2, attention_resolutions="4")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 1)))
    matcher = get_matcher("icfm", sigma=0.0)
    loss_fn = jax.jit(make_cfm_loss_fn(model, matcher, paired=True))
    rng = np.random.default_rng(1)
    x1 = rng.standard_normal((8, 8, 8, 1)).astype(np.float32)
    from tpu_diffusion.losses.cfm import host_ot_pairs
    (x0, x1p), = list(host_ot_pairs(iter([x1]), seed=3))
    val = loss_fn(params, jax.random.PRNGKey(2),
                  (jnp.asarray(x0), jnp.asarray(x1p)))
    assert np.isfinite(float(val))
