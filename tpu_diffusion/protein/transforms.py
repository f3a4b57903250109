"""Graph/structure transforms on padded dense protein batches.

Rebuilds `amortised diffusion/src/transforms/`:
  * `pyg_transforms.py` KnnGraph / RadiusGraph / AddLabel / OneHotEncode ->
    dense masked pair-mask builders + array transforms (SaveGraphToDisk is
    `FileDataset.write` in data/storage.py);
  * `frame_transforms.py` backbone `OrientationFrames` (Gram-Schmidt frames
    from N/CA/C) and the ideal backbone constants;
  * biotite_transforms.py's structure->graph step is `positions_to_graph`
    (scale + center + full connectivity), shared with protein/data.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu_diffusion.protein.geometry import center
from tpu_diffusion.protein.gvp import norm_no_nan

Array = jax.Array

# Ideal backbone geometry (frame_transforms.py constants)
IDEAL_N_CA = 1.458   # Angstrom
IDEAL_CA_C = 1.525
IDEAL_C_N = 1.329
IDEAL_CA_CA = 3.80
IDEAL_N_CA_C_ANGLE = 1.937  # rad (~111 deg)


def pairwise_dist(pos: Array, mask: Array) -> Tuple[Array, Array]:
    d = jnp.sqrt(jnp.sum(
        (pos[:, :, None, :] - pos[:, None, :, :]) ** 2, -1) + 1e-12)
    n = pos.shape[1]
    valid = (mask[:, :, None] & mask[:, None, :]) & ~jnp.eye(n, dtype=bool)
    return d, valid


def full_graph(mask: Array) -> Array:
    """Fully-connected pair mask without self loops (torch_utils.py:80-84)."""
    n = mask.shape[-1]
    return (mask[:, :, None] & mask[:, None, :]) & ~jnp.eye(n, dtype=bool)


def radius_graph(pos: Array, mask: Array, radius: float) -> Array:
    """Edges within `radius` (pyg_transforms RadiusGraph)."""
    d, valid = pairwise_dist(pos, mask)
    return valid & (d <= radius)


def knn_graph(pos: Array, mask: Array, k: int) -> Array:
    """k nearest neighbors per node (pyg_transforms KnnGraph). Returns a
    dense [B, N, N] mask with True where j is among i's k nearest."""
    d, valid = pairwise_dist(pos, mask)
    d = jnp.where(valid, d, jnp.inf)
    # kth smallest distance per row as threshold
    kth = -jax.lax.top_k(-d, min(k, d.shape[-1]))[0][..., -1:]
    return valid & (d <= kth)


def one_hot_encode(labels: Array, num_classes: int) -> Array:
    return jax.nn.one_hot(labels, num_classes)


def positions_to_graph(coords: Array, scale: float = 1.0 / 15.0) -> Array:
    """Scale + COM-center raw coordinates (torch_utils.py:67-78)."""
    return center(coords[None] * scale)[0]


class OrientationFrames(NamedTuple):
    """Backbone rigid frames: rotation [.., N, 3, 3] + translation [.., N, 3]
    (frame_transforms.py:11-321's Gram-Schmidt construction)."""

    rotations: Array
    translations: Array

    @classmethod
    def from_backbone(cls, n_pos: Array, ca_pos: Array, c_pos: Array
                      ) -> "OrientationFrames":
        """Gram-Schmidt: e1 along CA->C, e2 orthogonalized CA->N, e3 cross."""
        v1 = c_pos - ca_pos
        v2 = n_pos - ca_pos
        e1 = v1 / norm_no_nan(v1, keepdims=True)
        u2 = v2 - jnp.sum(e1 * v2, -1, keepdims=True) * e1
        e2 = u2 / norm_no_nan(u2, keepdims=True)
        e3 = jnp.cross(e1, e2)
        rot = jnp.stack([e1, e2, e3], axis=-1)
        return cls(rotations=rot, translations=ca_pos)

    def apply(self, local: Array) -> Array:
        """Map local coordinates into the global frame."""
        return jnp.einsum("...ij,...j->...i", self.rotations, local) \
            + self.translations

    def invert_apply(self, global_pos: Array) -> Array:
        return jnp.einsum("...ji,...j->...i", self.rotations,
                          global_pos - self.translations)


def ideal_backbone_from_ca(ca_pos: Array) -> Tuple[Array, Array]:
    """Place idealized N and C atoms around each C-alpha using neighbor
    directions (the frame_transforms idealization used when only CA traces
    exist). Returns (n_pos, c_pos) of the same shape as ca_pos."""
    # Edge-extrapolated neighbor directions (NOT jnp.roll, which would
    # borrow the opposite chain end — or a zero pad row — for the
    # terminal residues, placing wildly non-physical N/C atoms there).
    # The terminal residue borrows the ADJACENT bond's direction
    # (continuing the local bend), not a mirror of its own bond — exact
    # antiparallel to_prev/to_next would make the N/C directions
    # collinear and degenerate the Gram-Schmidt OrientationFrame.
    fwd = ca_pos[..., 1:, :] - ca_pos[..., :-1, :]        # [..., L-1, 3]
    if fwd.shape[-2] >= 2:
        head = -fwd[..., 1:2, :]    # ca[-1] ~ ca[0] - (ca[2] - ca[1])
        tail = fwd[..., -2:-1, :]   # ca[L] ~ ca[L-1] + (ca[L-2]-ca[L-3])
    else:  # 2-residue chain: frames are underdetermined either way
        head = -fwd[..., :1, :]
        tail = fwd[..., -1:, :]
    to_next = jnp.concatenate([fwd, tail], axis=-2)
    to_prev = jnp.concatenate([head, -fwd], axis=-2)
    e_next = to_next / norm_no_nan(to_next, keepdims=True)
    e_prev = to_prev / norm_no_nan(to_prev, keepdims=True)
    c_pos = ca_pos + IDEAL_CA_C * e_next
    n_pos = ca_pos + IDEAL_N_CA * e_prev
    return n_pos, c_pos
