"""REAL multi-process DDP: two OS processes form one jax.distributed world
over the CPU backend, build a global ("data", "model") mesh, assemble
host-local batches into a global array, and run one psum-backed sharded
train-like reduction. Exercises `parallel/distributed.py` end to end —
the multi-host path the reference never had (SURVEY.md §2.4 DDP row).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from tpu_diffusion.parallel.distributed import (host_local_to_global,
                                                initialize_distributed,
                                                process_batch_slice)
from tpu_diffusion.parallel.mesh import make_mesh
import pytest

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow

active = initialize_distributed()
assert active, "distributed init returned False under 2-process env"
assert jax.process_count() == 2, jax.process_count()

mesh = make_mesh()  # over the 2-process global device set
assert int(np.prod(list(mesh.shape.values()))) == jax.device_count()

# host-local shard -> global batch
global_batch = 8
sl = process_batch_slice(global_batch)
full = np.arange(global_batch, dtype=np.float32).reshape(global_batch, 1)
local = full[sl]
gb = host_local_to_global(mesh, local)
assert gb.shape == (global_batch, 1), gb.shape

# a data-parallel reduction over the global array: mean == host-independent
mean = jax.jit(lambda x: jnp.mean(x))(gb)
np.testing.assert_allclose(float(mean), full.mean(), rtol=1e-6)
print(f"[worker {jax.process_index()}] ok mean={float(mean):.3f}",
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_ddp_world(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        # one virtual device per process: a 2-device global world
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        pp = env.get("PYTHONPATH", "")
        if repo not in pp.split(os.pathsep):
            env["PYTHONPATH"] = os.pathsep.join(p for p in [repo, pp] if p)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "ok mean=3.500" in out, out
