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


# --- device-resident data pipeline + scanned trainer (round 4) ---

def _scanned_setup():
    """Toy regression with an on-device batch sampler."""
    w_true = jnp.array([1.5, -2.0])

    def loss_fn(params, key, batch):
        pred = batch @ params["w"]
        return jnp.mean((pred - batch @ w_true) ** 2)

    tx = make_optimizer(1e-1, warmup=0, grad_clip=1.0, schedule="constant")
    params = {"w": jnp.zeros(2)}
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(loss_fn, tx, ema_decay=0.9)

    def sample_batch(key):
        return jax.random.normal(key, (16, 2))

    return step, state, sample_batch


def test_fit_scanned_chunk_invariant():
    """The batch stream is fold_in(base_key, global_step): the final state
    must be bitwise identical for any chunking of the same step count."""
    mesh = make_mesh()
    base = jax.random.PRNGKey(42)
    finals = []
    for chunk in (8, 4, 3):       # 3 exercises the tail-chunk recompile
        step, state, sample = _scanned_setup()
        tr = Trainer(step, state, iter(()), mesh=mesh)
        finals.append(tr.fit_scanned(8, sample, chunk=chunk,
                                     base_key=base))
    for other in finals[1:]:
        assert int(other.step) == 8
        for a, b in zip(jax.tree.leaves(finals[0].params),
                        jax.tree.leaves(other.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_scanned_resume_exact():
    """Stopping after 4 steps and resuming from the carried state replays
    the identical stream (keys derive from state.step, not host position)."""
    mesh = make_mesh()
    base = jax.random.PRNGKey(7)
    step, state, sample = _scanned_setup()
    full = Trainer(step, state, iter(()), mesh=mesh).fit_scanned(
        8, sample, chunk=4, base_key=base)

    step2, state2, _ = _scanned_setup()
    tr = Trainer(step2, state2, iter(()), mesh=mesh)
    mid = tr.fit_scanned(4, sample, chunk=4, base_key=base)
    resumed = Trainer(step2, mid, iter(()), mesh=mesh).fit_scanned(
        4, sample, chunk=4, base_key=base)
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_scanned_trains_and_reports_traces():
    mesh = make_mesh()
    step, state, sample = _scanned_setup()
    rows = []
    tr = Trainer(step, state, iter(()), mesh=mesh)
    final = tr.fit_scanned(40, sample, chunk=10,
                           metrics_hook=lambda s, m: rows.append((s, m)))
    assert int(final.step) == 40
    assert [s for s, _ in rows] == [10, 20, 30, 40]
    assert rows[0][1]["loss_trace"].shape == (10,)
    assert rows[-1][1]["loss"] < rows[0][1]["loss_trace"][0] * 0.5


def test_device_cache_sample_batch_and_flip():
    from tpu_diffusion.data.device_cache import sample_batch, stage
    from tpu_diffusion.data.registry import synthetic_images

    mesh = make_mesh()
    ds = synthetic_images(32, 8, 8, 1, 4, seed=3)
    images = stage(ds.images, mesh)
    key = jax.random.PRNGKey(0)
    b1 = jax.jit(lambda k: sample_batch(images, k, 8, flip=False,
                                        mesh=mesh))(key)
    assert b1.shape == (8, 8, 8, 1) and b1.dtype == jnp.float32
    # every sampled row is a dataset row
    flat = np.asarray(images).reshape(32, -1)
    for row in np.asarray(b1).reshape(8, -1):
        assert (np.abs(flat - row).max(1) < 1e-6).any()
    # same key -> same batch; flip produces rows that are flips of rows
    b1b = jax.jit(lambda k: sample_batch(images, k, 8, mesh=mesh))(key)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b1b))
    bf = np.asarray(sample_batch(images, key, 64, flip=True))
    both = np.concatenate([flat, flat.reshape(32, 8, 8)[:, :, ::-1]
                           .reshape(32, -1)])
    for row in bf.reshape(64, -1):
        assert (np.abs(both - row).max(1) < 1e-6).any()


def test_device_cache_cfm_pair_sampler_couples():
    """Sinkhorn coupling must beat the independent coupling on mean
    pair distance (that is its entire purpose)."""
    from tpu_diffusion.data.device_cache import (make_cfm_pair_sampler,
                                                 stage)
    from tpu_diffusion.data.registry import synthetic_images

    ds = synthetic_images(64, 8, 8, 1, 4, seed=0)
    images = stage(ds.images)
    key = jax.random.PRNGKey(5)
    paired = jax.jit(make_cfm_pair_sampler(images, 32, ot="sinkhorn"))
    indep = jax.jit(make_cfm_pair_sampler(images, 32, ot=None))
    d = lambda xy: float(jnp.mean(jnp.sum((xy[0] - xy[1]) ** 2, (1, 2, 3))))
    assert d(paired(key)) < d(indep(key))


def test_device_cache_protein_sampler():
    from tpu_diffusion.data.device_cache import make_protein_sampler
    from tpu_diffusion.protein.data import get_protein_data

    mesh = make_mesh()
    ds = get_protein_data("does/not/exist", max_len=24, n_synthetic=16)
    sample = jax.jit(make_protein_sampler(ds.positions, ds.lengths, 8,
                                          mesh=mesh))
    b = sample(jax.random.PRNGKey(0))
    assert b["pos"].shape == (8, 24, 3) and b["mask"].shape == (8, 24)
    assert b["mask"].dtype == jnp.bool_
    # mask rows are true prefixes matching a dataset length
    m = np.asarray(b["mask"])
    runs = m.sum(1)
    np.testing.assert_array_equal(m, np.arange(24)[None] < runs[:, None])
    assert set(runs.tolist()) <= set(np.asarray(ds.lengths).tolist())
    # rows come from the dataset
    flat = np.asarray(ds.positions).reshape(16, -1)
    for row in np.asarray(b["pos"]).reshape(8, -1):
        assert (np.abs(flat - row).max(1) < 1e-6).any()
