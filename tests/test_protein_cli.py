"""Protein train -> sample -> evaluate end-to-end (tiny, CPU)."""

import json
import os

import numpy as np
import pytest

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_protein_quality_resumes_from_full_state(tmp_path):
    """scripts/protein_quality.py restart-from-latest: a second invocation
    with an extended snapshot list restores the full TrainState from
    <out>/resume, keeps the already-persisted curve rows verbatim, and
    trains only the remaining segment."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import protein_quality

    out = str(tmp_path / "pq")
    tiny = ["--batch_size", "4", "--max_len", "16",
            "--node_scalars", "8", "--node_vectors", "2",
            "--conv_layers", "1", "--diffusion_steps", "8",
            "--num_samples", "2", "--sample_batch", "2",
            "--num_train_eval", "4", "--chunk", "3", "--out", out]
    protein_quality.main(["--snapshot_steps", "0,6"] + tiny)
    with open(os.path.join(out, "quality_curve.json")) as f:
        first = json.load(f)
    assert [r["step"] for r in first["curve"]] == [0, 6]
    assert os.path.isdir(os.path.join(out, "resume"))

    protein_quality.main(["--snapshot_steps", "0,6,12"] + tiny)
    with open(os.path.join(out, "quality_curve.json")) as f:
        second = json.load(f)
    assert [r["step"] for r in second["curve"]] == [0, 6, 12]
    # rows <= the resume point are the persisted ones, not re-evaluated
    assert second["curve"][:2] == first["curve"]
    # only the 6->12 segment was trained in the second invocation
    assert second["train_steps_per_sec_incl_eval"] > 0


def test_protein_pipeline_end_to_end(tmp_path):
    from tpu_diffusion.cli import sample_protein, train_protein
    from tpu_diffusion.protein import evaluate

    out = str(tmp_path / "protein")
    train_args = ["--output_dir", out, "--num_steps", "3",
                  "--batch_size", "8", "--max_len", "24",
                  "--node_scalars", "16", "--node_vectors", "4",
                  "--conv_layers", "1", "--diffusion_steps", "20"]
    train_protein.main(train_args)
    assert os.path.exists(os.path.join(out, "gvp", "config.yaml"))

    # resume path: a second run restores from the checkpoint
    train_protein.main(train_args + ["--num_steps", "4"])

    sample_dir = str(tmp_path / "samples")
    sample_protein.main([
        "--ckpt_dir", os.path.join(out, "gvp", "ckpt"),
        "--output_dir", sample_dir, "--num_samples", "3",
        "--batch_size", "3", "--max_len", "24",
        "--node_scalars", "16", "--node_vectors", "4",
        "--conv_layers", "1", "--diffusion_steps", "20"])
    files = [f for f in os.listdir(sample_dir) if f.endswith(".npy")
             and f.startswith("sample")]
    assert len(files) == 3
    with open(os.path.join(sample_dir, "summary.json")) as f:
        summary = json.load(f)
    assert "cond_loss_mean" in summary

    evaluate.main(["--sample_dir", sample_dir, "--novelty",
                   "--train_root", "nonexistent", "--max_train", "5"])
    assert os.path.exists(os.path.join(sample_dir, "sample_stats.csv"))
    with open(os.path.join(sample_dir, "summary_stats.json")) as f:
        stats = json.load(f)
    assert stats["finite_mean"] == 1.0
    assert "novelty_rmsd_mean" in stats
    assert np.isfinite(stats["radius_of_gyration_mean"])


def _ideal_helix(n=30):
    # alpha-helix CA trace: radius 2.3 A, rise 1.5 A, 100 deg/residue
    i = np.arange(n)
    a = np.radians(100.0 * i)
    return np.stack([2.3 * np.cos(a), 2.3 * np.sin(a), 1.5 * i], -1)


def _ideal_strand(n=20):
    # beta-strand CA trace: 3.3 A rise with alternating 1.0 A pleat
    i = np.arange(n)
    return np.stack([3.3 * i, ((-1.0) ** i), np.zeros(n)], -1)


def test_sse_classifier_helix_and_strand():
    from tpu_diffusion.protein.evaluate import (secondary_structure,
                                                sse_proportions)
    helix = secondary_structure(_ideal_helix())
    assert np.mean(helix == "a") > 0.7, helix
    strand = secondary_structure(_ideal_strand())
    assert np.mean(strand == "b") > 0.6, strand
    assert np.sum(strand == "a") == 0
    # random-walk coil: no dominant structure class
    rng = np.random.default_rng(0)
    coil = np.cumsum(rng.normal(0, 2.5, (40, 3)), axis=0)
    props = sse_proportions(coil)
    assert abs(props["helix_proportion"] + props["sheet_proportion"]
               + props["coil_proportion"] - 1.0) < 1e-9
    # proportions keys match the reference's BackboneCASSEEvaluator output
    assert set(props) == {"helix_proportion", "sheet_proportion",
                          "coil_proportion"}


def test_eval_many_parallel_matches_serial():
    from tpu_diffusion.protein.evaluate import EvaluationPipeline
    rng = np.random.default_rng(1)
    structures = {f"s{i}": np.cumsum(rng.normal(0, 2.0, (25, 3)), axis=0)
                  for i in range(6)}
    pipe = EvaluationPipeline()
    serial = pipe.eval_many(structures)
    parallel = pipe.eval_many(structures, n_jobs=3)
    assert [r["id"] for r in serial] == [r["id"] for r in parallel]
    for a, b in zip(serial, parallel):
        for k in a:
            if isinstance(a[k], float) and np.isfinite(a[k]):
                assert abs(a[k] - b[k]) < 1e-12, k


def test_training_stats_cache_and_comparison(tmp_path):
    from tpu_diffusion.protein.evaluate import (EvaluationPipeline,
                                                compare_to_training,
                                                summarize)
    rng = np.random.default_rng(2)
    train = {f"t{i}": np.cumsum(rng.normal(0, 2.0, (20, 3)), axis=0)
             for i in range(4)}
    cache = str(tmp_path / "train_stats.csv")
    pipe = EvaluationPipeline()
    rows1 = pipe.eval_training_set(train, cache)
    assert os.path.exists(cache)
    rows2 = pipe.eval_training_set(train, cache)  # loaded from cache
    assert [r["id"] for r in rows1] == [r["id"] for r in rows2]
    np.testing.assert_allclose(
        [r["radius_of_gyration"] for r in rows1],
        [r["radius_of_gyration"] for r in rows2], rtol=1e-6)

    samples = {f"s{i}": np.cumsum(rng.normal(0, 2.0, (20, 3)), axis=0)
               for i in range(4)}
    sample_rows = pipe.eval_many(samples)
    comp = compare_to_training(sample_rows, rows1)
    assert "radius_of_gyration_w1_vs_train" in comp
    assert np.isfinite(comp["radius_of_gyration_w1_vs_train"])
    summ = summarize(sample_rows)
    assert "sheet_proportion_mean" in summ and "ca_distance_mean_std" in summ


def test_motif_rmsd_table_exact_and_rotated(tmp_path):
    """scripts/motif_acceptance.py: RMSD 0 for a planted motif, invariant
    to rototranslation (Kabsch), correct valid-index handling."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import motif_acceptance as ma

    rng = np.random.default_rng(0)
    motif = rng.normal(size=(8, 3)).astype(np.float32) * 3
    idx = np.arange(40, 48)
    # sample 0: motif planted verbatim
    c0 = rng.normal(size=(80, 3)).astype(np.float32) * 5
    c0[idx] = motif
    # sample 1: motif planted rotated + translated (Kabsch must zero it)
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    c1 = rng.normal(size=(100, 3)).astype(np.float32) * 5
    c1[idx] = motif @ rot.T + np.array([1.0, -2.0, 3.0], np.float32)
    # sample 2: too short for the motif indices -> skipped
    c2 = rng.normal(size=(20, 3)).astype(np.float32)
    d = tmp_path / "samples"
    d.mkdir()
    np.save(d / "sample_0000.npy", c0)
    np.save(d / "sample_0001.npy", c1)
    np.save(d / "sample_0002.npy", c2)
    table = ma.motif_rmsd_table(str(d), motif, idx)
    assert table["n"] == 2
    assert table["rmsd_median"] < 1e-4
    assert table["frac_under_1A"] == 1.0
