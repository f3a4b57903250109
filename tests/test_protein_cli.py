"""Protein train -> sample -> evaluate end-to-end (tiny, CPU)."""

import json
import os

import numpy as np


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
