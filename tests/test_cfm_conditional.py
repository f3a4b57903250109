"""Conditional CFM trainer CLI: inpaint (weighted) + superres tiny runs."""

import json
import os

import numpy as np
import pytest

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _run(tmp_path, *extra):
    from tpu_diffusion.cli import train_cfm_conditional as cli
    out = str(tmp_path / "out")
    cli.main(["--dataset", "mnist", "--model", "icfm",
              "--output_dir", out, "--num_steps", "2", "--batch_size", "8",
              "--warmup", "1", "--eval_batches", "1",
              "--eval_batch_size", "8", "--eval_method", "euler",
              "--eval_every_div", "1", "--num_channels", "8",
              "--eval_ode_steps", "2", *extra])
    return out


def test_inpaint_weighted(tmp_path):
    out = _run(tmp_path, "--task", "inpaint", "--weighted_loss")
    d = os.path.join(out, "mnist_inpaint_icfm")
    with open(os.path.join(d, "results.json")) as f:
        res = json.load(f)
    assert np.isfinite(res["mse"]) and res["nfe"] == 2
    assert os.path.exists(os.path.join(d, "results_per_step.json"))
    imgs = os.listdir(os.path.join(d, "images"))
    assert any(f.startswith("generated") for f in imgs)


def test_superres(tmp_path):
    out = _run(tmp_path, "--task", "superres")
    d = os.path.join(out, "mnist_superres_icfm")
    with open(os.path.join(d, "results.json")) as f:
        res = json.load(f)
    assert np.isfinite(res["psnr"])
