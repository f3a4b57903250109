"""InceptionV3 (FID variant, pool3 2048-d features) in Flax.

The full architecture of the standard FID feature network
(`pt_inception-2015-12-05`: InceptionA/B/C/D/E blocks with the TF-style
asymmetric convolutions), so exact-FID parity only needs a local weight
export — this environment has no egress to fetch one. `load_inception_fn`
maps an .npz of named arrays onto the module tree; without weights the
graph is still constructible (random init) for shape/latency testing.

Input convention: images in [-1, 1], NHWC, any HxW (resized to 299x299
bilinear, matching the FID protocol).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class BasicConv(nn.Module):
    """Conv + BatchNorm(eps=1e-3, no scale) + ReLU (TF Inception style)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str | Tuple = "VALID"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         use_scale=False, name="bn")(x)
        return nn.relu(x)


def _pool(x, size=3, stride=1, pad="SAME", kind="avg"):
    if kind == "avg":
        # The FID network (pt_inception-2015-12-05 / pytorch-fid's
        # FIDInceptionA/C/E) averages branch pools with
        # count_include_pad=False — border windows divide by the number of
        # REAL elements, not the full window size. flax defaults to
        # count_include_pad=True, which silently skews every border pixel
        # of every branch_pool (caught by tests/test_torch_crossval.py).
        return nn.avg_pool(x, (size, size), strides=(stride, stride),
                           padding=pad, count_include_pad=False)
    return nn.max_pool(x, (size, size), strides=(stride, stride),
                       padding=pad)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding="SAME", name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding="SAME", name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding="SAME", name="branch3x3dbl_3")(b3)
        bp = _pool(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding="SAME", name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _pool(x, 3, 2, "VALID", "max")
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding="SAME", name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding="SAME", name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding="SAME", name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding="SAME", name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding="SAME", name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding="SAME", name="branch7x7dbl_5")(bd)
        bp = _pool(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding="SAME", name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding="SAME", name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _pool(x, 3, 2, "VALID", "max")
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # FID variant uses max-pool in the last block

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding="SAME", name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding="SAME", name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], -1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding="SAME", name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding="SAME",
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding="SAME",
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], -1)
        bp = _pool(x, 3, 1, "SAME", self.pool_kind)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], -1)


class InceptionV3Features(nn.Module):
    """Pool3 feature extractor: [B, H, W, 3] in [-1,1] -> [B, 2048]."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b = x.shape[0]
        if x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), "bilinear")
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, -1)
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding="SAME", name="Conv2d_2b_3x3")(x)
        x = _pool(x, 3, 2, "VALID", "max")
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _pool(x, 3, 2, "VALID", "max")
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> 2048


def load_inception_fn(path: Optional[str] = None
                      ) -> Callable[[Array], Array]:
    """Feature fn from an .npz of named arrays; random init when path is
    None (architecture/latency testing only — NOT valid FID)."""
    net = InceptionV3Features()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3)))
    if path:
        loaded = dict(np.load(path))
        flat = {"/".join(str(p.key) for p in kp): leaf
                for kp, leaf in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
        new = {}
        missing = []
        for key in flat:
            if key in loaded:
                arr = np.asarray(loaded[key])
                if arr.shape != flat[key].shape:
                    raise ValueError(
                        f"shape mismatch for {key}: {arr.shape} vs "
                        f"{flat[key].shape}")
                new[key] = arr
            else:
                missing.append(key)
        if missing:
            raise KeyError(f"weights missing {len(missing)} entries, e.g. "
                           f"{missing[:3]}")
        paths, treedef = jax.tree_util.tree_flatten_with_path(variables)
        leaves = [new["/".join(str(p.key) for p in kp)]
                  for kp, _ in paths]
        variables = jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.jit(lambda x: net.apply(variables, x))
