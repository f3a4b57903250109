"""Plotting pipeline and debug utilities."""

import os

import jax.numpy as jnp
import numpy as np
import pytest


def _rows(n=10, seed=0):
    rng = np.random.default_rng(seed)
    return [{"id": f"s{i}", "ca_distance_mean": float(rng.normal(3.8, 0.1)),
             "radius_of_gyration": float(rng.normal(12, 2)),
             "hull_volume": float(rng.normal(5000, 300))}
            for i in range(n)]


def test_plot_pipeline_writes_figures(tmp_path):
    from tpu_diffusion.eval.plotting import run_plot_pipeline
    paths = run_plot_pipeline(_rows(), str(tmp_path), train_rows=_rows(8, 1),
                              summary={"ca_distance_mean": 3.8,
                                       "radius_of_gyration": 12.0})
    assert set(paths) == {"distributions", "radar", "parallel"}
    for p in paths.values():
        assert os.path.getsize(p) > 1000


def _protein_rows(n=12, seed=0):
    rng = np.random.default_rng(seed)
    return [{"id": f"s{i}",
             "ca_distance_mean": float(rng.normal(3.8, 0.1)),
             "ca_angle_mean": float(rng.normal(90, 8)),
             "helix_proportion": float(rng.uniform(0.2, 0.5)),
             "sheet_proportion": float(rng.uniform(0.1, 0.3)),
             "coil_proportion": float(rng.uniform(0.3, 0.6)),
             "radius_of_gyration": float(rng.normal(12, 2)),
             "shpericality": float(rng.uniform(0.3, 0.8)),
             "exceeds_canvas": float(rng.integers(0, 2)),
             "novelty_tm_score": float(rng.uniform(0.2, 0.9))}
            for i in range(n)]


def test_protein_plot_pipeline_named_figures(tmp_path):
    """The reference's named figure set (plot_pipeline.py:284-298) incl.
    KS radar, SSE stacked bars and the cond-loss-vs-step line plots."""
    from tpu_diffusion.eval.plotting import run_protein_plot_pipeline
    loss_dir = tmp_path / "cond_loss_samples"
    loss_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        np.save(loss_dir / f"condloss_{i}.npy",
                np.abs(rng.normal(0.02, 0.01, size=125)).cumsum()[::-1])
    paths = run_protein_plot_pipeline(
        _protein_rows(), str(tmp_path / "plots"),
        train_rows=_protein_rows(15, 1), cond_rows=_protein_rows(8, 2),
        cond_loss_dir=str(loss_dir))
    expect = {"backbone_dist_mean", "backbone_angle_mean",
              "secondary_structure_usage", "radius_of_gyration",
              "sphericity", "radar", "novelty_tm_score",
              "cond_loss_mse", "cond_loss_rmsd"}
    assert set(paths) == expect
    for p in paths.values():
        assert os.path.getsize(p) > 1000


def test_ks_similarity_extremes():
    from tpu_diffusion.eval.plotting import ks_similarity
    a = [{"x": float(v)} for v in np.linspace(0, 1, 50)]
    b = [{"x": float(v)} for v in np.linspace(10, 11, 50)]
    assert ks_similarity(a, a, "x") == pytest.approx(1.0, abs=0.05)
    assert ks_similarity(a, b, "x") == pytest.approx(0.0, abs=1e-9)


def test_structure_plot_and_gif(tmp_path):
    from tpu_diffusion.eval.plotting import plot_structure, trajectory_gif
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(30, 3)).cumsum(0)
    fig = plot_structure(coords, "test")
    assert fig is not None
    traj = np.stack([coords * (1 - k / 5) + rng.normal(size=(30, 3))
                     * (k / 5) for k in range(5)])
    gif = trajectory_gif(traj, str(tmp_path / "t.gif"), fps=2)
    assert os.path.getsize(gif) > 1000


def test_compiled_cost():
    from tpu_diffusion.utils.debug import compiled_cost
    cost = compiled_cost(lambda a, b: a @ b,
                         jnp.zeros((64, 64)), jnp.zeros((64, 64)))
    assert cost.get("flops", 0) >= 2 * 64**3 * 0.9


def test_checkify_sampler_catches_nan():
    from tpu_diffusion.utils.debug import checkify_sampler

    def bad(x):
        return x / jnp.zeros_like(x)

    wrapped = checkify_sampler(bad)
    with pytest.raises(Exception):
        wrapped(jnp.ones(3))

    def good(x):
        return x * 2

    np.testing.assert_allclose(checkify_sampler(good)(jnp.ones(3)), 2.0)


def test_strip_checkpoint_keys():
    from tpu_diffusion.utils.debug import strip_checkpoint_keys
    assets = {"params": {"w": 1, "schedule": {"betas": 2}},
              "schedule": 3, "step": 4}
    out = strip_checkpoint_keys(assets, ["schedule"])
    assert out == {"params": {"w": 1}, "step": 4}


def test_trace_context():
    from tpu_diffusion.utils.debug import trace
    with trace("test"):
        _ = jnp.ones(4) + 1
