"""LPIPS-style perceptual distance with pluggable backbones.

The reference reports LPIPS(vgg) throughout its evals
(mnist/train_mnist.py:360-400, trainer2.py:103-129, experiments/main.py:
279-302) via the `lpips` package. Pretrained VGG weights cannot be fetched
in this environment, so the metric is built as machinery:

  lpips(x, y) = sum_l mean_hw || unit(f_l(x)) - unit(f_l(y)) ||^2

with `unit` = channel-unit-normalization, over a feature pyramid. The
default pyramid is a fixed-seed VGG-topology conv stack ("random LPIPS" —
deterministic and self-consistent; NOT comparable to published LPIPS(vgg)
numbers). Drop pretrained weights in and `PerceptualDistance` reproduces
the official metric.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class VGGFeaturePyramid(nn.Module):
    """VGG16-topology conv features (pre-pool activations per stage)."""

    widths: Sequence[int] = (64, 128, 256, 512, 512)
    convs_per_stage: Sequence[int] = (2, 2, 3, 3, 3)

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats = []
        h = x
        for stage, (w, n) in enumerate(zip(self.widths,
                                           self.convs_per_stage)):
            for i in range(n):
                h = nn.Conv(w, (3, 3), padding="SAME",
                            dtype=jnp.float32)(h)
                h = nn.relu(h)
            feats.append(h)
            if stage != len(self.widths) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


def _unit_normalize(f: Array) -> Array:
    return f / jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True) + 1e-10)


class PerceptualDistance:
    """lpips-package-compatible callable: dist(x, y) -> [B].

    With `lin_weights`/`shift`/`scale` set (via `load_lpips_fn`) this is
    the OFFICIAL LPIPS formula: inputs in [-1,1] pass the lpips scaling
    layer, per-tap unit-normalized feature diffs are weighted by the
    learned per-channel lin heads, spatially averaged, and summed over
    taps. Without them it degrades to the unweighted random-feature
    variant (self-consistent only; NOT comparable to published LPIPS)."""

    def __init__(self, feature_fn: Callable[[Array], List[Array]] | None
                 = None, image_size: int = 64, channels: int = 3,
                 seed: int = 123,
                 lin_weights: List[Array] | None = None,
                 shift: Array | None = None, scale: Array | None = None):
        if feature_fn is None:
            net = VGGFeaturePyramid()
            params = net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, image_size, image_size, channels)))
            feature_fn = lambda x: net.apply(params, x)
        self._fn = feature_fn
        self._lin = lin_weights
        self._shift = shift
        self._scale = scale
        self._jit = jax.jit(self._distance)

    def _distance(self, x: Array, y: Array) -> Array:
        if self._shift is not None:
            x = (x - self._shift) / self._scale
            y = (y - self._shift) / self._scale
        fx = self._fn(x)
        fy = self._fn(y)
        total = 0.0
        for layer, (a, b) in enumerate(zip(fx, fy)):
            diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            if self._lin is not None:
                diff = diff * self._lin[layer]
            total = total + jnp.mean(jnp.sum(diff, -1), axis=(1, 2))
        return total

    def __call__(self, x: Array, y: Array) -> Array:
        if x.shape[-1] == 1:  # grayscale -> 3-channel, lpips convention
            x = jnp.repeat(x, 3, axis=-1)
            y = jnp.repeat(y, 3, axis=-1)
        return self._jit(x, y)


def load_lpips_fn(path: str) -> PerceptualDistance:
    """Official LPIPS(vgg) from an .npz produced by
    scripts/import_inception_weights.py (`lpips` subcommand): VGG16 conv
    weights (params/Conv_{i}/kernel|bias), learned lin heads (lin/{l}),
    and the lpips scaling layer (shift/scale). Parity surface for the
    reference's `lpips.LPIPS(net="vgg")` (experiments/main.py:279-302)."""
    import numpy as np

    loaded = dict(np.load(path))
    net = VGGFeaturePyramid()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = {"/".join(str(p.key) for p in kp): leaf for kp, leaf in
            jax.tree_util.tree_flatten_with_path(variables)[0]}
    new = {}
    for key, ref in flat.items():
        if key not in loaded:
            raise KeyError(f"LPIPS npz missing {key}")
        arr = np.asarray(loaded[key])
        if arr.shape != ref.shape:
            raise ValueError(f"shape mismatch for {key}: "
                             f"{arr.shape} vs {ref.shape}")
        new[key] = jnp.asarray(arr)
    paths, treedef = jax.tree_util.tree_flatten_with_path(variables)
    variables = jax.tree_util.tree_unflatten(
        treedef, [new["/".join(str(p.key) for p in kp)] for kp, _ in paths])
    lin = [jnp.asarray(loaded[f"lin/{layer}"]) for layer in range(5)]
    return PerceptualDistance(
        feature_fn=lambda x: net.apply(variables, x), lin_weights=lin,
        shift=jnp.asarray(loaded["shift"]),
        scale=jnp.asarray(loaded["scale"]))
