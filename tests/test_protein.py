"""Protein stack: geometry, graph SDE invariants, GVP equivariance,
ResDiff loss, motif conditioner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.protein.conditioner import (
    Structconditioner, place_indices_block_within_bounds)
from tpu_diffusion.protein.data import get_protein_data, protein_batches
from tpu_diffusion.protein.denoiser import GVPDenoiser, edge_features, rbf
from tpu_diffusion.protein.geometry import (aligned_rmsd, kabsch,
                                            kabsch_align,
                                            random_rotation_matrix)
from tpu_diffusion.protein.resdiff import resdiff_loss
from tpu_diffusion.protein.sde import (HoogeboomGraphSDE, ProteinBatch,
                                       VPGraphSDE, com_free_noise)

KEY = jax.random.PRNGKey(0)


def _batch(b=2, n=24, seed=0):
    ds = get_protein_data("nonexistent", max_len=n, n_synthetic=b + 2,
                          seed=seed)
    it = protein_batches(ds, b, seed=seed)
    raw = next(it)
    return ProteinBatch.from_positions(jnp.asarray(raw["pos"]),
                                       jnp.asarray(raw["mask"]))


# --- geometry ----------------------------------------------------------------


def test_kabsch_recovers_rotation():
    key1, key2 = jax.random.split(KEY)
    x = jax.random.normal(key1, (20, 3))
    rot_true = random_rotation_matrix(key2)
    trans_true = jnp.array([1.0, -2.0, 0.5])
    y = x @ rot_true.T + trans_true
    assert float(aligned_rmsd(x, y)) < 1e-4
    rot, trans = kabsch(x, y)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(rot_true),
                               atol=1e-4)


def test_kabsch_is_proper_rotation():
    # mirrored target must still produce det(R) = +1
    x = jax.random.normal(KEY, (10, 3))
    y = x.at[:, 0].multiply(-1.0)
    rot, _ = kabsch(x, y)
    assert float(jnp.linalg.det(rot)) == pytest.approx(1.0, abs=1e-4)


def test_kabsch_differentiable():
    x = jax.random.normal(KEY, (12, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (12, 3))

    def loss(y_):
        return jnp.sum((kabsch_align(x, y_) - y_) ** 2)

    g = jax.grad(loss)(y)
    assert np.all(np.isfinite(np.asarray(g)))


def test_random_rotation_is_orthonormal():
    r = random_rotation_matrix(KEY)
    np.testing.assert_allclose(np.asarray(r @ r.T), np.eye(3), atol=1e-5)
    assert float(jnp.linalg.det(r)) == pytest.approx(1.0, abs=1e-5)


# --- SDE ----------------------------------------------------------------------


def test_hoogeboom_schedule_matches_reference_formula():
    sde = HoogeboomGraphSDE(num_steps=250, s=1e-5)
    t = np.linspace(0, 1, 250)
    want = (1 - t**2) ** 2 * (1 - 2e-5) + 1e-5
    np.testing.assert_allclose(np.asarray(sde.alphas_cumprod), want,
                               rtol=1e-4, atol=1e-7)
    # beta clip
    assert float(jnp.max(sde.discrete_betas)) <= 0.25 + 1e-6


def test_beta_is_neg_dlog_abar():
    """Closed-form beta matches autodiff of -log alpha_bar."""
    sde = HoogeboomGraphSDE()
    f = lambda t: -jnp.log(sde.alphas_cumprod_fn(t))
    for tv in [0.1, 0.5, 0.9]:
        want = jax.grad(f)(jnp.asarray(tv))
        got = sde.beta_fn(jnp.asarray(tv))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_com_free_noise_properties():
    batch = _batch(b=3, n=24)
    z = com_free_noise(KEY, batch.pos, batch.mask)
    com = np.asarray(jnp.sum(z, axis=1))  # masked rows are zero
    np.testing.assert_allclose(com, 0.0, atol=1e-4)
    # padded rows are zero
    pad = ~np.asarray(batch.mask)
    assert np.all(np.asarray(z)[pad] == 0.0)


def test_noising_denoising_roundtrip():
    sde = HoogeboomGraphSDE()
    batch = _batch()
    t = jnp.array([0.3, 0.7])
    noised, eps = sde.noising(KEY, batch, t)
    rec = sde.denoising(noised, eps, t)
    np.testing.assert_allclose(np.asarray(rec.pos), np.asarray(batch.pos),
                               atol=1e-4)


def test_sample_blob_centered_and_masked():
    sde = HoogeboomGraphSDE()
    blob = sde.sample_blob(KEY, 4, 32, lengths=jnp.array([10, 20, 30, 32]))
    com = np.asarray(jnp.sum(blob.pos, axis=1))
    np.testing.assert_allclose(com, 0.0, atol=1e-4)
    assert int(blob.mask[0].sum()) == 10


def test_reverse_sampling_zero_model_converges():
    """With eps_hat == 0 the chain stays finite and COM-free."""
    sde = HoogeboomGraphSDE(num_steps=50)
    blob = sde.sample_blob(KEY, 2, 16)

    def model(batch, t):
        return jnp.zeros_like(batch.pos)

    out = jax.jit(lambda k, b: sde.reverse_diffusion_sampling(k, b, model))(
        jax.random.PRNGKey(1), blob)
    assert np.all(np.isfinite(np.asarray(out.pos)))
    np.testing.assert_allclose(np.asarray(jnp.sum(out.pos, 1)), 0.0,
                               atol=1e-3)


def test_vp_graph_sde():
    sde = VPGraphSDE(num_steps=100)
    np.testing.assert_allclose(
        np.asarray(sde.alphas_cumprod_fn(jnp.array(0.0))), 1.0, atol=1e-6)
    assert float(sde.alphas_cumprod_fn(jnp.array(1.0))) < 0.01


# --- GVP denoiser --------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_denoiser():
    model = GVPDenoiser(n_h_node_feats=(16, 4), n_h_edge_feats=(16, 4),
                        n_conv_layers=2, n_msg_layers=2, n_lookup_feats=8)
    batch = _batch(b=2, n=16)
    t = jnp.array([0.4, 0.6])
    params = model.init(KEY, batch, t)
    return model, params, batch, t


def test_rbf_shape_and_range():
    d = jnp.linspace(0, 6, 10)
    out = rbf(d)
    assert out.shape == (10, 16)
    assert float(out.max()) <= 1.0 + 1e-6


def test_edge_features_no_self_loops():
    batch = _batch(b=2, n=16)
    _, _, pair_mask = edge_features(batch.pos, batch.mask)
    assert not np.any(np.asarray(pair_mask)[:, np.arange(16), np.arange(16)])


def test_denoiser_output_shape_and_com_free(tiny_denoiser):
    model, params, batch, t = tiny_denoiser
    eps = model.apply(params, batch, t)
    assert eps.shape == batch.pos.shape
    np.testing.assert_allclose(np.asarray(jnp.sum(eps, axis=1)), 0.0,
                               atol=1e-3)


@pytest.mark.slow
def test_denoiser_remat_matches_plain(tiny_denoiser):
    """remat=True must be a pure memory/compute trade: same param tree,
    same outputs, same gradients as the plain model."""
    model, params, batch, t = tiny_denoiser
    rmodel = GVPDenoiser(n_h_node_feats=(16, 4), n_h_edge_feats=(16, 4),
                         n_conv_layers=2, n_msg_layers=2, n_lookup_feats=8,
                         remat=True)
    rparams = rmodel.init(KEY, batch, t)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(rparams))
    np.testing.assert_allclose(np.asarray(model.apply(params, batch, t)),
                               np.asarray(rmodel.apply(params, batch, t)),
                               atol=1e-5)

    def loss(p, m):
        return jnp.sum(m.apply(p, batch, t) ** 2)

    g_plain = jax.grad(loss)(params, model)
    g_remat = jax.grad(loss)(params, rmodel)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4), g_plain, g_remat)


def test_denoiser_se3_equivariance(tiny_denoiser):
    """eps(R x) == R eps(x): rotations commute; translations are killed by
    COM-centering of inputs (positions enter via relative vectors + the
    centered vector channel)."""
    model, params, batch, t = tiny_denoiser
    eps = model.apply(params, batch, t)
    rot = random_rotation_matrix(jax.random.PRNGKey(7))
    rotated = batch._replace(pos=batch.pos @ rot.T)
    eps_rot = model.apply(params, rotated, t)
    np.testing.assert_allclose(np.asarray(eps_rot),
                               np.asarray(eps @ rot.T), atol=2e-4)


def test_denoiser_padding_invariance(tiny_denoiser):
    """Values in masked padding rows must not affect real outputs."""
    model, params, batch, t = tiny_denoiser
    eps1 = model.apply(params, batch, t)
    junk = jnp.where(batch.mask[..., None], batch.pos, 77.0)
    eps2 = model.apply(params, batch._replace(pos=junk), t)
    m = np.asarray(batch.mask)
    np.testing.assert_allclose(np.asarray(eps1)[m], np.asarray(eps2)[m],
                               atol=1e-4)


# --- loss + conditioner ---------------------------------------------------------


def test_resdiff_loss_finite_and_grads(tiny_denoiser):
    model, params, batch, _ = tiny_denoiser
    sde = HoogeboomGraphSDE(num_steps=50)

    def loss(p, key):
        apply = lambda b, t: model.apply(p, b, t)
        total, metrics = resdiff_loss(key, apply, sde, batch)
        return total

    val, grads = jax.value_and_grad(loss)(params, KEY)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree.leaves(grads))


def test_motif_conditioner_pulls_toward_motif():
    sde = HoogeboomGraphSDE(num_steps=40)
    n = 16
    motif = jax.random.normal(KEY, (4, 3)) * 0.3
    # the REFERENCE's shipped hyperparameters: gs=1500 (sample.py:88) and
    # the conditioner active only for step < Ns/2 (sample.py: 125 of 250)
    # — under the reference-faithful gs*a*(1-a) scale law these defaults
    # work as shipped (the old abar-based law needed an ad-hoc gs)
    cond = Structconditioner(motif_pos=motif,
                             motif_indices=jnp.arange(4) + 6,
                             guidance_scale=1500.0)
    blob = sde.sample_blob(jax.random.PRNGKey(2), 2, n)

    def model(batch, t):  # identity-ish x0 model: eps prediction zero
        return jnp.zeros_like(batch.pos)

    guided = jax.jit(lambda k, b: sde.reverse_diffusion_sampling(
        k, b, model, conditioner=cond, cond_start_step=20))
    plain = jax.jit(lambda k, b: sde.reverse_diffusion_sampling(k, b, model))
    out_g = guided(jax.random.PRNGKey(3), blob)
    out_p = plain(jax.random.PRNGKey(3), blob)
    lg = float(jnp.mean(cond.final_loss(out_g)))
    lp = float(jnp.mean(cond.final_loss(out_p)))
    assert lg < lp


def test_place_indices_block():
    idx = jnp.array([50, 51, 52, 53])
    out = np.asarray(place_indices_block_within_bounds(idx, 20))
    assert out.min() >= 0 and out.max() < 20
    np.testing.assert_array_equal(np.diff(out), [1, 1, 1])


def test_protein_data_synthetic_geometry():
    """Synthetic chains must have realistic (scaled) CA-CA spacing."""
    ds = get_protein_data("nonexistent", max_len=64, n_synthetic=4)
    pos = ds.positions[0][:ds.lengths[0]] / (1.0 / 15.0)  # unscale to A
    d = np.linalg.norm(np.diff(pos, axis=0), axis=-1)
    assert 2.0 < d.mean() < 5.0  # ~3.8 A consecutive CA spacing
