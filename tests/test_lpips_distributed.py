"""LPIPS machinery + distributed helpers (single-process paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_diffusion.eval.lpips import PerceptualDistance
from tpu_diffusion.parallel.distributed import (host_local_to_global,
                                                initialize_distributed,
                                                process_batch_slice)
from tpu_diffusion.parallel.mesh import make_mesh
import pytest

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_lpips_zero_for_identical_and_orders_by_distortion():
    d = PerceptualDistance(image_size=32, channels=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(d(x, x)), 0.0, atol=1e-6)
    small = d(x, x + 0.05)
    large = d(x, x + 0.5)
    assert float(small.mean()) < float(large.mean())
    assert small.shape == (2,)


def test_lpips_grayscale_promotes_channels():
    d = PerceptualDistance(image_size=28, channels=3)
    x = jnp.zeros((1, 28, 28, 1))
    assert d(x, x).shape == (1,)


def test_initialize_distributed_noop_single_process(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("NUM_PROCESSES", "1")
    assert initialize_distributed() is False


def test_host_local_to_global_single_process():
    mesh = make_mesh()
    batch = np.arange(16 * 2, dtype=np.float32).reshape(16, 2)
    arr = host_local_to_global(mesh, batch)
    np.testing.assert_array_equal(np.asarray(arr), batch)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data")


def test_process_batch_slice_single():
    assert process_batch_slice(32) == slice(0, 32)
