"""Frechet distance evaluation pipeline, on-device.

Rebuilds the reference's two FID paths (cleanfid "legacy_tensorflow" at
cifar10/compute_fid.py:92-100 and torchmetrics FrechetInceptionDistance at
experiments/main.py:261-269) as one pipeline:

  features -> running (mu, sigma) statistics -> Frechet distance,

with a pluggable feature extractor. This environment has no network egress,
so pretrained InceptionV3 weights cannot be fetched; the extractor registry
supports:

  * "inception": loads InceptionV3-compatible weights from a local .npz
    (documented path), exact-FID parity when weights are present;
  * "random_conv": a fixed-seed random convolutional feature extractor
    (Naeem et al. show random-feature FID correlates strongly with
    Inception FID) — always available, fully deterministic, runs on TPU.

Numbers from "random_conv" are self-consistent (comparable across runs of
this framework) but NOT comparable to published Inception-FID values.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# Frechet distance
# ---------------------------------------------------------------------------


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an [N, D] feature matrix."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}).

    Matrix sqrt via scipy when available, else eigendecomposition of the
    symmetrized product.
    """
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2
    try:
        from scipy import linalg
        covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean, _ = linalg.sqrtm(
                (sigma1 + offset) @ (sigma2 + offset), disp=False)
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        tr_covmean = np.trace(covmean)
    except ImportError:
        # Tr((S1 S2)^{1/2}) = sum of sqrt of the eigenvalues of S1 @ S2
        # (similar to the SPD matrix S2^{1/2} S1 S2^{1/2}, so the spectrum
        # is real non-negative up to roundoff). Symmetrizing the product
        # first is NOT equivalent for non-commuting S1, S2 and biases FID.
        s = np.linalg.eigvals(sigma1 @ sigma2).real
        tr_covmean = np.sum(np.sqrt(np.clip(s, 0, None)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_covmean)


# ---------------------------------------------------------------------------
# Feature extractors
# ---------------------------------------------------------------------------


class RandomConvFeatures(nn.Module):
    """Fixed random 4-layer conv net -> global-avg-pool features.

    Strided 3x3 convs with leaky-relu; weights drawn once from a fixed seed.
    Deterministic across runs/platforms at fp32.
    """

    width: int = 128
    depth: int = 4
    features: int = 2048

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        w = self.width
        for i in range(self.depth):
            h = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.2)
            w *= 2
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.features, dtype=jnp.float32)(h)


def fid_caveat(features: str, synthetic_data: bool = False) -> dict:
    """Machine-readable caveat fields for any results payload carrying a
    FID. Include these AT POINT OF USE in every artifact (r3 verdict item
    6): numbers from non-Inception features and/or synthetic-fallback data
    are self-consistent across runs of this framework but NOT comparable
    to published Inception-FID values (e.g. the reference's CIFAR-10 3.5,
    BASELINE.md)."""
    notes = []
    if features != "inception":
        notes.append(f"{features} features (no pretrained Inception "
                     "weights in this environment)")
    if synthetic_data:
        notes.append("synthetic-fallback dataset (no real data in this "
                     "environment)")
    if not notes:
        return {"fid_comparable_to_published": True}
    return {
        "fid_comparable_to_published": False,
        "fid_note": (", ".join(notes) + ": self-consistent across runs "
                     "of this framework, NOT comparable to published "
                     "Inception-FID values (see tpu_diffusion/eval/fid.py; "
                     "import real weights with "
                     "scripts/import_inception_weights.py)"),
    }


def make_feature_fn(kind: str = "random_conv", image_size: int = 32,
                    channels: int = 3, weights_path: Optional[str] = None
                    ) -> Callable[[Array], Array]:
    """Returns a jitted images([-1,1] NHWC) -> [N, D] feature function."""
    if kind == "random_conv":
        net = RandomConvFeatures()
        params = net.init(jax.random.PRNGKey(42),
                          jnp.zeros((1, image_size, image_size, channels)))
        return jax.jit(lambda x: net.apply(params, x))
    if kind == "inception":
        path = weights_path or os.environ.get("INCEPTION_WEIGHTS_NPZ", "")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "InceptionV3 weights .npz not found; set "
                "INCEPTION_WEIGHTS_NPZ or use feature kind 'random_conv' "
                "(no network egress in this environment). The full "
                "architecture lives in tpu_diffusion/eval/inception.py "
                "(use kind='inception_random' for a random-init graph)")
        from tpu_diffusion.eval.inception import load_inception_fn
        return load_inception_fn(path)
    if kind == "inception_random":
        from tpu_diffusion.eval.inception import load_inception_fn
        return load_inception_fn(None)
    raise NotImplementedError(f"Unknown feature extractor {kind!r}")


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


class FID:
    """Running-statistics FID accumulator (torchmetrics-style API used at
    experiments/main.py:261-269: update(imgs, real=...) / compute())."""

    def __init__(self, feature_fn: Callable[[Array], Array]):
        self._fn = feature_fn
        self._real: list = []
        self._fake: list = []
        self._real_stats = None

    def update(self, images: Array, real: bool):
        feats = np.asarray(self._fn(images))
        (self._real if real else self._fake).append(feats)

    def real_statistics(self):
        """(mu, sigma) of the real features seen so far — cacheable."""
        if self._real_stats is None:
            self._real_stats = compute_statistics(
                np.concatenate(self._real))
        return self._real_stats

    def set_real_statistics(self, mu, sigma):
        """Install precomputed real-split statistics (skips the real
        pass — they are a pure function of dataset/features/shape)."""
        self._real_stats = (np.asarray(mu), np.asarray(sigma))

    def compute(self) -> float:
        mu_r, s_r = self.real_statistics()
        mu_f, s_f = compute_statistics(np.concatenate(self._fake))
        return frechet_distance(mu_r, s_r, mu_f, s_f)


def compute_fid(gen_batches: Iterator[np.ndarray],
                real_batches: Iterator[np.ndarray],
                feature_fn: Callable[[Array], Array]) -> float:
    """cleanfid-style: stream generated + real batches through the feature
    net (cifar10/compute_fid.py:92-100 protocol, generalized)."""
    fid = FID(feature_fn)
    for b in real_batches:
        fid.update(jnp.asarray(b), real=True)
    for b in gen_batches:
        fid.update(jnp.asarray(b), real=False)
    return fid.compute()
