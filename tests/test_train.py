"""End-to-end training-stack tests on the virtual 8-device CPU mesh:
loss decreases, EMA tracks, checkpoint roundtrips, CLI runs (SURVEY.md §4
items (c) and (d))."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.core.ema import EMAState, ema_update
from tpu_diffusion.data.registry import (get_dataset, infinite_batches,
                                         synthetic_images)
from tpu_diffusion.parallel.mesh import (batch_sharding, local_batch_size,
                                         make_mesh, shard_batch)
from tpu_diffusion.train.actions import PeriodicCallback
from tpu_diffusion.train.checkpoint import CheckpointManager
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)
from tpu_diffusion.train.writers import LocalWriter


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh2 = make_mesh(model=2)
    assert mesh2.shape["data"] == 4
    assert local_batch_size(32, mesh) == 4
    with pytest.raises(ValueError):
        local_batch_size(30, mesh)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    batch = np.zeros((16, 4, 4, 1), np.float32)
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding == batch_sharding(mesh)


def test_ema_update_every_gating():
    params = {"w": jnp.zeros(3)}
    st = EMAState.create(params)
    new = {"w": jnp.ones(3)}
    st = ema_update(st, new, decay=0.5, update_every=2)
    np.testing.assert_allclose(st.params["w"], 0.0)  # count=1, skipped
    st = ema_update(st, new, decay=0.5, update_every=2)
    np.testing.assert_allclose(st.params["w"], 0.5)  # count=2, applied


@pytest.mark.slow
def test_synthetic_datasets_and_registry():
    for name, (h, c) in [("mnist", (28, 1)), ("cifar10", (32, 3)),
                         ("flowers", (64, 3)), ("celeba", (64, 3))]:
        ds = get_dataset(name)("nonexistent_dir", train=True)
        assert ds.shape == (h, h, c)
        assert ds.synthetic
        assert ds.images.min() >= -1 and ds.images.max() <= 1
    # determinism
    a = get_dataset("mnist")("x", train=True)
    b = get_dataset("mnist")("x", train=True)
    np.testing.assert_array_equal(a.images[:8], b.images[:8])


def test_infinite_batches_shapes_and_flip():
    ds = synthetic_images(64, 8, 8, 1, 4, seed=0)
    it = infinite_batches(ds, 16, seed=0, flip=True)
    for _ in range(6):  # crosses an epoch boundary
        batch = next(it)
        assert batch.shape == (16, 8, 8, 1)


def _toy_regression_setup(mesh):
    """Tiny linear-model regression: loss must drop fast."""
    import optax
    w_true = jnp.array([1.5, -2.0])

    def loss_fn(params, key, batch):
        pred = batch @ params["w"]
        target = batch @ w_true
        return jnp.mean((pred - target) ** 2)

    tx = make_optimizer(1e-1, warmup=0, grad_clip=1.0, schedule="constant")
    params = {"w": jnp.zeros(2)}
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(loss_fn, tx, ema_decay=0.9)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield rng.normal(size=(16, 2)).astype(np.float32)

    return step, state, batches()


def test_trainer_loss_decreases_and_callbacks_fire():
    mesh = make_mesh()
    step, state, batches = _toy_regression_setup(mesh)
    seen = []

    cb = PeriodicCallback(
        callback_fn=lambda step, metrics, **kw: seen.append(
            (step, metrics["loss"])), every_steps=10)
    trainer = Trainer(step, state, batches, mesh=mesh, callbacks=[cb])
    final = trainer.fit(60)
    assert int(final.step) == 60
    assert seen, "callback never fired"
    first, last = seen[0][1], seen[-1][1]
    assert last < first * 0.5
    # EMA params track learned params
    np.testing.assert_allclose(np.asarray(final.ema.params["w"]),
                               np.asarray(final.params["w"]), atol=0.5)


def test_periodic_callback_call_every_step_enforced():
    cb = PeriodicCallback(callback_fn=lambda **kw: None, every_steps=5)
    cb(1)
    cb(2)
    with pytest.raises(ValueError):
        cb(9)


def test_checkpoint_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), maximum=2)
    assets = {"params": {"w": np.arange(4, dtype=np.float32)},
              "step": 7}
    mgr.save(7, assets)
    mgr.save(9, {"params": {"w": np.ones(4, np.float32)}, "step": 9})
    restored, step = mgr.load({"params": {"w": np.zeros(4, np.float32)},
                               "step": 0})
    assert step == 9
    np.testing.assert_allclose(restored["params"]["w"], 1.0)
    # retention: oldest purged after a third save
    mgr.save(11, {"params": {"w": np.zeros(4, np.float32)}, "step": 11})
    assert mgr.latest_step() == 11
    mgr.close()


def test_local_writer_csv_and_images(tmp_path):
    w = LocalWriter(str(tmp_path / "logs"), flush_every_n=1)
    w.log_hparams({"lr": 0.1, "nested": {"a": 1}})
    w.write_scalars(0, {"loss": 1.0})
    w.write_scalars(10, {"loss": 0.5, "psnr": 20.0})
    w.write_images(0, {"samples": np.zeros((4, 8, 8, 1), np.float32)})
    w.flush()
    assert os.path.exists(tmp_path / "logs" / "config.yaml")
    assert os.path.exists(tmp_path / "logs" / "metrics.csv")
    files = os.listdir(tmp_path / "logs" / "images")
    assert any(f.startswith("samples") for f in files)


@pytest.mark.slow
def test_cli_main_tiny_end_to_end(tmp_path):
    """The flagship CLI on a tiny config: train a few steps + eval;
    results.json written; loss finite."""
    from tpu_diffusion.cli import main as cli_main
    workdir = str(tmp_path / "exp")
    os.makedirs(workdir)
    cli_main.main([
        "--config", "mnist,inpainting,amortized",
        "--mode", "all",
        "--workdir", workdir,
        "--override", "training.num_steps=4",
        "--override", "training.batch_size=8",
        "--override", "diffusion.num_steps=100",
        "--override", "testing.num_test=8",
        "--override", "testing.batch_size=8",
        "--override", "network.num_channels=8",
        "--override", "network.attention_resolutions=",
        "--override", "network.dtype=float32",
    ])
    with open(os.path.join(workdir, "results.json")) as f:
        results = json.load(f)
    assert np.isfinite(results["mse_mean"])
    assert os.path.exists(os.path.join(workdir, "metrics.csv"))


@pytest.mark.slow
def test_cli_main_fid_flag(tmp_path):
    """testing.fid=True adds a finite fid to results.json."""
    from tpu_diffusion.cli import main as cli_main
    workdir = str(tmp_path / "exp_fid")
    os.makedirs(workdir)
    cli_main.main([
        "--config", "mnist,inpainting,amortized",
        "--mode", "all", "--workdir", workdir,
        "--override", "training.num_steps=2",
        "--override", "training.batch_size=8",
        "--override", "diffusion.num_steps=50",
        "--override", "testing.num_test=8",
        "--override", "testing.batch_size=8",
        "--override", "testing.fid=true",
        "--override", "network.num_channels=8",
        "--override", "network.attention_resolutions=",
        "--override", "network.dtype=float32",
    ])
    with open(os.path.join(workdir, "results.json")) as f:
        results = json.load(f)
    assert np.isfinite(results["fid"])


def test_real_format_loader_goldens():
    """Committed raw-format fixtures (IDX + CIFAR-bin) pin the real-data
    parsing path byte-exactly (allow_synthetic=False; ref mnist/data.py:36-97
    and cifar10/train_cifar10.py:69-87 formats)."""
    from tpu_diffusion.data.registry import get_dataset
    fx = os.path.join(os.path.dirname(__file__), "fixtures")

    ds = get_dataset("mnist")(os.path.join(fx, "mnist"), train=True,
                              allow_synthetic=False)
    assert ds.images.shape == (4, 28, 28, 1)
    assert ds.images.dtype == np.float32
    assert ds.labels.tolist() == [3, 1, 4, 1]
    # diagonal-stripe pixels: uint8 255 / 175 -> [-1,1] goldens
    np.testing.assert_allclose(ds.images[0, 0, 0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(ds.images[0, 5, 5, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(ds.images[2, 3, 5, 0], 0.37254906, atol=1e-6)
    assert float(ds.images.min()) == -1.0

    # .gz IDX path (test split is gzipped in the fixtures)
    dst = get_dataset("mnist")(os.path.join(fx, "mnist"), train=False,
                               allow_synthetic=False)
    assert dst.images.shape == (2, 28, 28, 1)
    assert dst.labels.tolist() == [7, 2]
    np.testing.assert_allclose(float(dst.images.mean()), -6.0007282e-05,
                               rtol=1e-4)

    c = get_dataset("cifar10")(os.path.join(fx, "cifar"), train=True,
                               allow_synthetic=False)
    assert c.images.shape == (20, 32, 32, 3)
    assert c.labels.tolist() == [0, 1, 2, 3] * 5
    np.testing.assert_allclose(
        c.images[0, 0, 0], [-0.38823527, 0.25490201, 0.31764710], atol=1e-6)
    np.testing.assert_allclose(float(c.images.mean()), 0.0018379950,
                               rtol=1e-4)
    ct = get_dataset("cifar10")(os.path.join(fx, "cifar"), train=False,
                                allow_synthetic=False)
    assert ct.images.shape == (2, 32, 32, 3)
    assert ct.labels.tolist() == [0, 1]

    # missing-root behavior: allow_synthetic=False must raise, not fall back
    import pytest
    with pytest.raises(FileNotFoundError):
        get_dataset("mnist")(os.path.join(fx, "nope"), train=True,
                             allow_synthetic=False)
    with pytest.raises(FileNotFoundError):
        get_dataset("cifar10")(os.path.join(fx, "nope"), train=True,
                               allow_synthetic=False)


def test_pretrained_weights_lookup_table():
    """(dataset, conditioning[, likelihood]) -> path surface matches the
    reference table semantics (experiments/config.py:7-35,159-167)."""
    from tpu_diffusion.utils.config import (get_config,
                                            pretrained_weights_path)
    # amortized entries depend on the likelihood
    assert pretrained_weights_path("mnist", "inpainting", "amortized") == \
        "weights/mnist_ddpm_unconditional"
    assert pretrained_weights_path("flowers", "outpainting", "amortized") == \
        "weights/flowers_outpainting_amortized"
    # guidance/replacement share the unconditional net
    assert pretrained_weights_path(
        "celeba", "inpainting", "reconstruction_guidance") == \
        "weights/celeba_ddpm_unconditional"
    # unregistered combos -> "" (train from scratch), like the reference's
    # except-branch
    assert pretrained_weights_path("cifar10", "inpainting", "amortized") == ""
    # get_config wires the lookup into network.model_path
    cfg = get_config("mnist,inpainting,amortized")
    assert cfg.network.model_path == "weights/mnist_ddpm_unconditional"


@pytest.mark.slow
def test_cli_main_warmstart_from_pretrained(tmp_path):
    """network.model_path bootstraps params from a saved checkpoint via
    load_matching_params (reference load_matching_weights integration)."""
    from tpu_diffusion.cli import main as cli_main
    from tpu_diffusion.train.checkpoint import load_pretrained
    from tpu_diffusion.utils.config import apply_overrides, get_config

    overrides = [
        "training.num_steps=2", "training.batch_size=8",
        "diffusion.num_steps=50", "network.num_channels=8",
        "network.attention_resolutions=", "network.dtype=float32",
    ]
    workdir = str(tmp_path / "pre")
    os.makedirs(workdir)
    cli_main.main(["--config", "mnist,inpainting,amortized",
                   "--mode", "train", "--workdir", workdir]
                  + [a for o in overrides for a in ("--override", o)])
    ckpt_dir = os.path.join(workdir, "ckpt")
    loaded = load_pretrained(ckpt_dir)
    assert loaded is not None and "ema" in loaded

    config = get_config("mnist,inpainting,amortized")
    apply_overrides(config, overrides
                    + [f"network.model_path={ckpt_dir}"])
    parts = cli_main.build(config)
    state, _ = cli_main.init_state(config, parts, jax.random.PRNGKey(7))
    # every leaf shape-matches, so the warm start must equal the saved EMA
    got = jax.tree.leaves(state.params)
    want = jax.tree.leaves(loaded["ema"])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a bogus path falls back to fresh init (no crash, different params)
    config2 = get_config("mnist,inpainting,amortized")
    apply_overrides(config2, overrides
                    + [f"network.model_path={tmp_path / 'nope'}"])
    state2, _ = cli_main.init_state(config2, cli_main.build(config2),
                                    jax.random.PRNGKey(7))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(state2.params), want)]
    assert max(diffs) > 0
