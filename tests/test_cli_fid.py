"""Smoke tests: CFM training CLI end-to-end tiny run + FID machinery."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.eval.fid import (FID, compute_statistics,
                                    frechet_distance, make_feature_fn)
from tpu_diffusion.eval.metrics import psnr, ssim

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    mu, sig = compute_statistics(x)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_known_gaussians():
    """For isotropic Gaussians: FID = ||dmu||^2 + sum (sqrt(v1)-sqrt(v2))^2."""
    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    s1, s2 = np.eye(d), np.eye(d) * 4.0
    want = 4.0 * d + d * (1.0 - 2.0) ** 2
    got = frechet_distance(mu1, s1, mu2, s2)
    assert got == pytest.approx(want, rel=1e-6)


def test_fid_accumulator_discriminates():
    """FID(real, real-like) << FID(real, noise)."""
    fn = make_feature_fn("random_conv", image_size=16, channels=1)
    rng = np.random.default_rng(0)
    base = rng.normal(size=(64, 16, 16, 1)).astype(np.float32) * 0.1

    fid_close = FID(fn)
    fid_far = FID(fn)
    for f in (fid_close, fid_far):
        f.update(jnp.asarray(base), real=True)
    fid_close.update(jnp.asarray(base + 0.01), real=False)
    fid_far.update(jnp.asarray(
        rng.uniform(-1, 1, size=(64, 16, 16, 1)).astype(np.float32)),
        real=False)
    assert fid_close.compute() < fid_far.compute() * 0.5


def test_fid_real_stats_cache_roundtrip():
    """set_real_statistics(real_statistics()) reproduces compute() exactly
    — the disk cache in cli/compute_fid.py relies on this."""
    fn = make_feature_fn("random_conv", image_size=16, channels=1)
    rng = np.random.default_rng(2)
    real = rng.normal(size=(64, 16, 16, 1)).astype(np.float32) * 0.1
    fake = rng.uniform(-1, 1, size=(64, 16, 16, 1)).astype(np.float32)

    fid_a = FID(fn)
    fid_a.update(jnp.asarray(real), real=True)
    fid_a.update(jnp.asarray(fake), real=False)
    mu, sigma = fid_a.real_statistics()
    score_a = fid_a.compute()

    fid_b = FID(fn)  # never sees real images
    fid_b.set_real_statistics(mu, sigma)
    fid_b.update(jnp.asarray(fake), real=False)
    assert fid_b.compute() == pytest.approx(score_a, rel=1e-12)


def test_inception_kind_raises_without_weights():
    with pytest.raises((FileNotFoundError, NotImplementedError)):
        make_feature_fn("inception")


def test_psnr_ssim_sanity():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 1)).astype(np.float32))
    assert float(psnr(a, a).min()) > 60
    np.testing.assert_allclose(ssim(a, a), 1.0, atol=1e-5)
    noisy = a + 0.2 * jnp.asarray(
        rng.normal(size=a.shape).astype(np.float32))
    assert float(psnr(a, noisy).mean()) < 30
    assert float(ssim(a, noisy).mean()) < 0.95


def test_train_cifar10_cli_tiny(tmp_path):
    """3 steps of icfm training on the synthetic CIFAR set + sampling."""
    from tpu_diffusion.cli import train_cifar10 as cli
    out = str(tmp_path / "results")
    cli.main(["--model", "icfm", "--output_dir", out,
              "--num_channel", "8", "--total_steps", "3",
              "--batch_size", "16", "--save_step", "1000",
              "--warmup", "2", "--sample_grid", "8", "--sample_steps", "4"])
    assert os.path.exists(os.path.join(out, "icfm", "metrics.csv")) or \
        os.path.exists(os.path.join(out, "icfm", "config.yaml"))
    # final sample grid got written
    imgs = os.listdir(os.path.join(out, "icfm", "images"))
    assert any(f.startswith("icfm_generated") for f in imgs)


def test_train_cifar10_cli_otcfm_sinkhorn(tmp_path):
    """OT-CFM with the on-device sinkhorn pairing (TPU-safe path)."""
    from tpu_diffusion.cli import train_cifar10 as cli
    out = str(tmp_path / "results")
    cli.main(["--model", "otcfm", "--ot_method", "sinkhorn",
              "--output_dir", out, "--num_channel", "8",
              "--total_steps", "2", "--batch_size", "16",
              "--save_step", "1000", "--warmup", "2",
              "--sample_grid", "8", "--sample_steps", "4"])
    assert os.path.exists(os.path.join(out, "otcfm", "config.yaml"))


def test_compute_fid_cli_tiny(tmp_path):
    """Train 2 steps then run the FID CLI with euler-4 and random features."""
    from tpu_diffusion.cli import compute_fid as fid_cli
    from tpu_diffusion.cli import train_cifar10 as cli
    out = str(tmp_path / "results")
    cli.main(["--model", "icfm", "--output_dir", out, "--num_channel", "8",
              "--total_steps", "2", "--batch_size", "16",
              "--save_step", "1000", "--warmup", "2",
              "--sample_grid", "8", "--sample_steps", "4"])
    fid_cli.main(["--model", "icfm", "--input_dir", out,
                  "--num_channel", "8", "--integration_method", "euler",
                  "--integration_steps", "4", "--num_gen", "64",
                  "--batch_size_fid", "64"])
    with open(os.path.join(out, "icfm", "fid_random_conv.json")) as f:
        result = json.load(f)
    assert np.isfinite(result["fid"])
    assert result["mean_nfe"] == 4


def test_compute_fid_cli_chunked_dopri5(tmp_path):
    """The TPU dopri5 path end-to-end on CPU: --dopri5_fixed_trip true
    engages the calibrated fixed-trip budget AND the Dopri5Chunked driver
    (multiple euler-scale device executions — required at batch 1024 on
    the axon tunnel, which kills minutes-long single executions)."""
    from tpu_diffusion.cli import compute_fid as fid_cli
    from tpu_diffusion.cli import train_cifar10 as cli
    out = str(tmp_path / "results")
    cli.main(["--model", "icfm", "--output_dir", out, "--num_channel", "8",
              "--total_steps", "2", "--batch_size", "16",
              "--save_step", "1000", "--warmup", "2",
              "--sample_grid", "8", "--sample_steps", "4"])
    fid_cli.main(["--model", "icfm", "--input_dir", out,
                  "--num_channel", "8", "--integration_method", "dopri5",
                  "--dopri5_fixed_trip", "true", "--dopri5_chunk", "8",
                  "--num_gen", "32", "--batch_size_fid", "32"])
    with open(os.path.join(out, "icfm", "fid_random_conv.json")) as f:
        result = json.load(f)
    assert np.isfinite(result["fid"])
    assert result["dopri5_chunk"] == 8
    assert result["dopri5_trip_budget"] >= 16
    assert result["mean_nfe"] > 6


def test_inception_random_graph_features():
    fn = make_feature_fn("inception_random")
    out = fn(jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(out)))


def test_inception_random_init_golden():
    """Pinned pool3 activations for the random-init InceptionV3 graph on a
    fixed input (VERDICT item 4): guards the architecture against silent
    changes so a weight drop-in stays trustworthy."""
    from tpu_diffusion.eval.inception import load_inception_fn
    fn = load_inception_fn(None)
    x = jnp.asarray(np.linspace(-1, 1, 2 * 32 * 32 * 3,
                                dtype=np.float32).reshape(2, 32, 32, 3))
    f = np.asarray(fn(x))
    assert f.shape == (2, 2048)
    # goldens refreshed after the count_include_pad=False fix to the
    # FID-Inception branch avg-pools (r3; the new graph is cross-validated
    # against a torch mirror in tests/test_torch_crossval.py)
    np.testing.assert_allclose(float(f.mean()), 0.00018313863, rtol=1e-3)
    np.testing.assert_allclose(float(f.std()), 0.00027120690, rtol=1e-3)
    np.testing.assert_allclose(
        f[0, :5],
        [0.001207295, 0.00013620597, 0.0,
         0.00011454832, 0.00028815368], rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(
        f[1, 1000:1005],
        [0.000253026, 0.0, 5.2401725e-07,
         0.000250117, 8.630859e-05], rtol=1e-3, atol=1e-9)


def test_inception_weight_roundtrip(tmp_path):
    """Saving the variable tree as a named .npz and loading it through
    `load_inception_fn(path)` reproduces the same features — the exact
    contract a real pt_inception weight export must satisfy."""
    from tpu_diffusion.eval.inception import InceptionV3Features, \
        load_inception_fn

    net = InceptionV3Features()
    variables = net.init(jax.random.PRNGKey(7), jnp.zeros((1, 299, 299, 3)))
    # perturb from the default init so a successful load is distinguishable
    variables = jax.tree.map(lambda a: a + 0.01, variables)
    flat = {"/".join(str(p.key) for p in kp): np.asarray(leaf)
            for kp, leaf in
            jax.tree_util.tree_flatten_with_path(variables)[0]}
    path = str(tmp_path / "inception.npz")
    np.savez(path, **flat)

    fn = load_inception_fn(path)
    x = jnp.asarray(np.linspace(-1, 1, 32 * 32 * 3,
                                dtype=np.float32).reshape(1, 32, 32, 3))
    expected = net.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(expected),
                               rtol=1e-5, atol=1e-7)

    # a wrong-shape entry must be rejected loudly
    bad = dict(flat)
    k = next(k for k, v in bad.items() if v.ndim > 0 and v.shape[-1] > 1)
    bad[k] = bad[k][..., :1]
    badpath = str(tmp_path / "bad.npz")
    np.savez(badpath, **bad)
    with pytest.raises((ValueError, KeyError)):
        load_inception_fn(badpath)

    # missing entries must be rejected loudly
    partial = {k: v for i, (k, v) in enumerate(flat.items()) if i > 0}
    ppath = str(tmp_path / "partial.npz")
    np.savez(ppath, **partial)
    with pytest.raises(KeyError):
        load_inception_fn(ppath)
