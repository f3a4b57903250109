"""SDE samplers, sweep tooling, and the class-conditional / SF2M CLI."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.core.schedules import DDPM, VPSDE
from tpu_diffusion.sampling.sde import (euler_maruyama, predictor_corrector,
                                        probability_flow,
                                        reverse_sde_sampler_from_eps)

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow

# --- SDE samplers with the exact Gaussian score ------------------------------


def _gaussian_score(sde):
    """Score of p_t when p_0 = N(mu0, s0^2): closed form."""
    mu0, s0 = 0.8, 0.05

    def score(x, t):
        s = sde.scale(t).reshape(-1, *([1] * (x.ndim - 1)))
        sig = sde.sigma(t).reshape(-1, *([1] * (x.ndim - 1)))
        var = (s * s0) ** 2 + sig**2
        return (s * mu0 - x) / var

    return score, mu0, s0


def test_euler_maruyama_recovers_gaussian():
    sde = VPSDE()
    score, mu0, s0 = _gaussian_score(sde)
    xT = jax.random.normal(jax.random.PRNGKey(0), (4096, 1))
    x0 = jax.jit(lambda k, x: euler_maruyama(k, score, sde, x, 500))(
        jax.random.PRNGKey(1), xT)
    assert abs(float(x0.mean()) - mu0) < 0.05
    assert abs(float(x0.std()) - s0) < 0.05


def test_probability_flow_recovers_mean():
    sde = VPSDE()
    score, mu0, _ = _gaussian_score(sde)
    xT = jax.random.normal(jax.random.PRNGKey(2), (2048, 1))
    x0 = jax.jit(lambda x: probability_flow(score, sde, x, 200))(xT)
    assert abs(float(x0.mean()) - mu0) < 0.05


def test_predictor_corrector_runs_and_improves():
    sde = VPSDE()
    score, mu0, s0 = _gaussian_score(sde)
    xT = jax.random.normal(jax.random.PRNGKey(3), (1024, 1))
    x0 = jax.jit(lambda k, x: predictor_corrector(
        k, score, sde, x, 200, n_corrector=2))(jax.random.PRNGKey(4), xT)
    assert abs(float(x0.mean()) - mu0) < 0.1


def test_reverse_sde_from_eps_adapter():
    ddpm = DDPM.create(100)
    eps_fn = lambda x, i: jnp.zeros_like(x)
    score = reverse_sde_sampler_from_eps(eps_fn, ddpm)
    out = score(jnp.ones((2, 3)), jnp.array([0.5, 0.9]))
    np.testing.assert_allclose(out, 0.0)


# --- sweep tooling ------------------------------------------------------------


def test_commands_builder_cartesian():
    from tpu_diffusion.cli.sweep import CommandsBuilder
    cmds = (CommandsBuilder("python run.py")
            .add("a", [1, 2]).add("b", ["x", "y", "z"]).build())
    assert len(cmds) == 6
    assert cmds[0] == "python run.py --override a=1 --override b=x"


def test_sweep_gen_and_aggregate(tmp_path):
    from tpu_diffusion.cli import sweep
    out = str(tmp_path / "commands.txt")
    sweep.main(["gen", "--base", "python -m x", "--grid", "g=1,2",
                "--grid", "s=0,1,2", "--out", out])
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 6

    # fake experiment tree: 2 gammas x 3 seeds
    import yaml
    rng = np.random.default_rng(0)
    for g in [1.0, 10.0]:
        for s in range(3):
            d = tmp_path / "logs" / f"exp_g{g}_s{s}"
            os.makedirs(d)
            with open(d / "config.yaml", "w") as f:
                yaml.safe_dump({"conditioning": {"gamma": g},
                                "seed": s}, f)
            with open(d / "results.json", "w") as f:
                json.dump({"mse": float(g + rng.normal(0, 0.01))}, f)
    rows = sweep.collect_results(str(tmp_path / "logs"))
    assert len(rows) == 6
    table = sweep.aggregate(rows, ["conditioning.gamma"])
    assert len(table) == 2
    mses = sorted(table["result.mse_mean"])
    assert mses[0] == pytest.approx(1.0, abs=0.1)
    assert mses[1] == pytest.approx(10.0, abs=0.1)
    assert "result.mse_ci95" in table.columns


# --- conditional CLI ------------------------------------------------------------


@pytest.mark.parametrize("variant", ["cfm", "sf2m"])
def test_conditional_mnist_cli(tmp_path, variant):
    from tpu_diffusion.cli import train_conditional_mnist as cli
    out = str(tmp_path / "cond")
    cli.main(["--variant", variant, "--output_dir", out,
              "--num_channel", "8", "--num_steps", "2",
              "--batch_size", "16", "--warmup", "1",
              "--sample_steps", "2", "--sample_grid_per_class", "1",
              "--save_every", "1000"])
    imgs = os.listdir(os.path.join(out, variant, "images"))
    assert any(f.startswith(f"{variant}_classes") for f in imgs)
