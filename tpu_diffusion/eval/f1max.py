"""F1Max metric (protein function prediction).

Rebuilds `amortised diffusion/src/metrics/f1_max.py:8-59` (torchmetrics
style): the maximum micro-averaged protein-centric F1 over score
thresholds, as used by DeepFRI/GearNet evaluations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def f1_max(preds: Array, targets: Array, thresholds: int = 101) -> Array:
    """preds: [N, C] scores in [0, 1]; targets: [N, C] binary.

    For each threshold: precision averaged over samples with >=1 prediction,
    recall averaged over all samples; F1 = 2pr/(p+r); return the max.
    """
    preds = jnp.asarray(preds, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    ts = jnp.linspace(0.0, 1.0, thresholds)

    def f1_at(thresh):
        sel = (preds >= thresh).astype(jnp.float32)      # [N, C]
        tp = jnp.sum(sel * targets, axis=-1)             # [N]
        n_pred = jnp.sum(sel, axis=-1)
        n_true = jnp.maximum(jnp.sum(targets, axis=-1), 1e-9)
        has_pred = (n_pred > 0).astype(jnp.float32)
        precision_i = tp / jnp.maximum(n_pred, 1e-9)
        precision = jnp.sum(precision_i * has_pred) / jnp.maximum(
            jnp.sum(has_pred), 1e-9)
        recall = jnp.mean(tp / n_true)
        return 2 * precision * recall / jnp.maximum(precision + recall,
                                                    1e-9)

    return jnp.max(jax.vmap(f1_at)(ts))


class F1Max:
    """Accumulating wrapper with the torchmetrics update/compute API."""

    def __init__(self, thresholds: int = 101):
        self.thresholds = thresholds
        self._preds = []
        self._targets = []

    def update(self, preds, targets):
        self._preds.append(jnp.asarray(preds))
        self._targets.append(jnp.asarray(targets))

    def compute(self) -> float:
        return float(f1_max(jnp.concatenate(self._preds),
                            jnp.concatenate(self._targets),
                            self.thresholds))
