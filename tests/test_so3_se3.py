"""SO(3)/R3/SE(3) diffuser correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.protein.se3 import R3Diffuser, Rigid, SE3Diffuser
from tpu_diffusion.protein.so3 import (SO3Diffuser, matrix_to_rotvec,
                                       rotvec_to_matrix)

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def so3():
    return SO3Diffuser(num_sigma=50, num_omega=300, n_l=100)


def test_rotvec_matrix_roundtrip():
    rng = np.random.default_rng(0)
    rv = jnp.asarray(rng.normal(size=(16, 3)) * 0.8)
    m = rotvec_to_matrix(rv)
    # orthonormality
    ident = np.einsum("bij,bkj->bik", np.asarray(m), np.asarray(m))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), (16, 3, 3)),
                               atol=1e-5)
    rec = matrix_to_rotvec(m)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rv), atol=1e-4)


def test_igso3_small_sigma_small_angles(so3):
    """At the smallest sigma, sampled angles concentrate near zero."""
    small = so3.sample_angle(KEY, jnp.zeros(()), (2048,))
    large = so3.sample_angle(KEY, jnp.ones(()), (2048,))
    assert float(jnp.mean(small)) < float(jnp.mean(large))
    # small-sigma IGSO3 approx Gaussian with std ~ sigma on each axis
    assert float(jnp.mean(small)) < 0.5


def test_igso3_score_negative_at_large_angle(so3):
    """log f decreases toward pi for small sigma: score < 0 there."""
    s = so3.score_norm(jnp.zeros(()), jnp.asarray(2.5))
    assert float(s) < 0


def test_so3_forward_marginal_orthonormal(so3):
    rot0 = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
    rot_t, rv = so3.forward_marginal(KEY, rot0, jnp.full((), 0.5))
    ident = np.einsum("bij,bkj->bik", np.asarray(rot_t), np.asarray(rot_t))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), (8, 3, 3)),
                               atol=1e-5)


def test_r3_forward_marginal_statistics():
    r3 = R3Diffuser()
    x0 = jnp.ones((4096, 1, 3)) * 5.0
    t = jnp.full((4096,), 1.0)
    xt, score = r3.forward_marginal(KEY, x0, t)
    # at t=1 the scaled marginal is ~N(0, 1) -> unscaled std = 1/0.1
    assert abs(float(jnp.std(r3._scale(xt))) - 1.0) < 0.05
    assert np.all(np.isfinite(np.asarray(score)))


def test_r3_score_is_gaussian_score():
    r3 = R3Diffuser()
    x0 = jnp.zeros((1, 1, 3))
    t = jnp.full((1,), 0.5)
    xt = jnp.ones((1, 1, 3)) * 2.0
    got = r3.score(xt, x0, t)
    var = 1 - np.exp(-float(r3.marginal_b_t(t)[0]))
    want = -(0.1 * 2.0) / var
    np.testing.assert_allclose(np.asarray(got)[0, 0], want, rtol=1e-4)


def test_r3_reverse_recovers_point():
    """Reverse diffusion with the exact score of a point mass converges."""
    r3 = R3Diffuser()
    target = jnp.zeros((1, 8, 3))
    n_steps = 100
    x = jax.random.normal(KEY, (1, 8, 3)) / r3.coordinate_scaling

    def body(carry, k):
        x, key = carry
        key, sk = jax.random.split(key)
        t = jnp.full((1,), 1.0 - k / n_steps)
        score = r3.score(x, target, t)
        x = r3.reverse_step(sk, x, score, t, 1.0 / n_steps, center=False)
        return (x, key), None

    (x0, _), _ = jax.lax.scan(body, (x, jax.random.PRNGKey(1)),
                              jnp.arange(n_steps))
    assert float(jnp.abs(x0).mean()) < 1.5  # pulled in from ~10 std


def test_se3_diffuser_combined(so3):
    se3 = SE3Diffuser(so3=so3)
    frames = Rigid.identity((4, 16))
    t = jnp.full((4,), 0.5)
    noised, rot_score, trans_score = se3.forward_marginal(KEY, frames, t)
    assert noised.rots.shape == (4, 16, 3, 3)
    assert noised.trans.shape == (4, 16, 3)
    assert np.all(np.isfinite(np.asarray(rot_score)))
    stepped = se3.reverse_step(jax.random.PRNGKey(2), noised, rot_score,
                               trans_score, t, 0.01)
    assert np.all(np.isfinite(np.asarray(stepped.trans)))


def test_se3_freeze_flags(so3):
    se3 = SE3Diffuser(so3=so3, diffuse_rot=False, diffuse_trans=True)
    frames = Rigid.identity((2, 4))
    noised, _, _ = se3.forward_marginal(KEY, frames, jnp.full((2,), 0.9))
    np.testing.assert_allclose(np.asarray(noised.rots),
                               np.broadcast_to(np.eye(3), (2, 4, 3, 3)))
    assert float(jnp.abs(noised.trans).max()) > 0


def test_rigid_apply():
    frames = Rigid.identity((3,))
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3)))
    np.testing.assert_allclose(np.asarray(frames.apply(pts)),
                               np.asarray(pts), atol=1e-6)


def test_so3_cache_dir(tmp_path):
    import os
    d = str(tmp_path / "cache")
    s1 = SO3Diffuser(num_sigma=10, num_omega=50, n_l=20, cache_dir=d)
    files = os.listdir(d)
    assert len(files) == 1
    s2 = SO3Diffuser(num_sigma=10, num_omega=50, n_l=20, cache_dir=d)
    np.testing.assert_array_equal(np.asarray(s1.cdf), np.asarray(s2.cdf))
