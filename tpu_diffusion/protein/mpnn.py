"""CA-only ProteinMPNN (inverse folding) in Flax.

The reference's self-consistency stage scores generated backbones with the
CA ProteinMPNN from an external package
(`amortised diffusion/src/evaluation/evaluation_pipeline.py:24-26,452-513`:
`load_protein_mpnn_model(model_type="ca")`, sequence sampling, NLL
re-scoring). That package (and its pretrained `ca_model_weights`) does not
exist in this environment, so `protein/self_consistency.py` defines a
scorer seam. This module fills the seam with a real model: the published
CA-ProteinMPNN architecture (Dauparas et al., Science 2022 — k-NN message
passing over RBF-encoded CA-frame distances, 3 encoder + 3 decoder layers,
random-decoding-order autoregression), implemented TPU-first:

  * the k-NN graph, features, and all message passing are dense jittable
    ops on static shapes (one `[L, K]` neighborhood tensor per structure);
  * sampling is a `lax.scan` over decode steps — each step is a
    teacher-forced pass whose causal mask makes it exact (a position only
    reads neighbors decoded before it, so the not-yet-decoded garbage is
    provably invisible), keeping shapes static instead of growing caches;
  * scoring (`log_probs`) is a single teacher-forced pass under a
    seed-derived decoding order, matching how the reference re-scores one
    design under `n_seq` different seeds (evaluation_pipeline.py:465-481).

Weights: random-init by default (like `eval/inception.py`'s random-feature
fallback — honest, deterministic, NOT the published model), with
`convert_mpnn_state_dict` mapping the public checkpoint's torch state-dict
layout (encoder_layers.{i}.W1.weight, features.edge_embedding.weight, ...)
into this module's parameter tree the day a weights file is available.
Architectural choices that a real-weight import must line up with (RBF
offset-pair order, scale=30 message normalization, GELU, LayerNorm eps)
are pinned in one place and documented inline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu_diffusion.protein.self_consistency import ALPHABET, ProteinMPNNScorer

Array = jax.Array

# 16 radial basis functions spanning 2-22 A (the published featurization).
RBF_MIN, RBF_MAX, NUM_RBF = 2.0, 22.0, 16
# relative sequence offset clipped to +-32 -> one-hot(66) (65 positions +
# the different-chain bucket, unused here: single chains)
MAX_REL_OFFSET = 32
# the 9 (node-shift, neighbor-shift) pairs whose CA-CA distances are
# RBF-encoded; (0, 0) is the plain CA_i - CA_j distance. If real weights
# are ever imported and features disagree, this table is the single place
# to permute.
SHIFT_PAIRS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
               (-1, -1), (-1, 1), (1, -1), (1, 1))


def _rbf(d: Array) -> Array:
    """[...] -> [..., NUM_RBF] Gaussian radial basis encoding."""
    mu = jnp.linspace(RBF_MIN, RBF_MAX, NUM_RBF)
    sigma = (RBF_MAX - RBF_MIN) / NUM_RBF
    return jnp.exp(-(((d[..., None] - mu) / sigma) ** 2))


def _shift(x: Array, offset: int) -> Array:
    """Chain-shifted copy of [L, 3] coords, edge-replicated at the ends.

    (The public torch featurizer zero-pads instead, which makes the two
    terminal residues' features depend on the global position relative to
    the coordinate origin — an SE(3)-invariance leak. Replication keeps
    every feature a pure inter-atom distance; if real weights are imported
    this is, with SHIFT_PAIRS, the place to match the original.)"""
    if offset == 0:
        return x
    if offset < 0:
        pad = jnp.broadcast_to(x[:1], (abs(offset), x.shape[-1]))
        return jnp.concatenate([pad, x[:offset]], 0)
    pad = jnp.broadcast_to(x[-1:], (offset, x.shape[-1]))
    return jnp.concatenate([x[offset:], pad], 0)


def knn_graph(coords: Array, mask: Array, k: int) -> Tuple[Array, Array]:
    """[L, 3], [L] -> (E_idx [L, K] neighbor indices, mask_attend [L, K]).

    Nearest neighbors by CA distance; padded positions are pushed to the
    far end so they are never selected while any valid neighbor remains.
    """
    L = coords.shape[0]
    d2 = jnp.sum((coords[:, None] - coords[None]) ** 2, -1)
    big = jnp.asarray(1e9, d2.dtype)
    # exclude self and padded columns
    d2 = d2 + big * (1.0 - mask)[None, :] + big * jnp.eye(L)
    k = min(k, L - 1)
    neg, e_idx = jax.lax.top_k(-d2, k)
    mask_attend = mask[:, None] * mask[e_idx]
    # neighbors that are only padding-fill (distance >= big) contribute 0
    mask_attend = mask_attend * (-neg < big / 2).astype(coords.dtype)
    return e_idx, mask_attend


def gather_nodes(h: Array, e_idx: Array) -> Array:
    """[L, C], [L, K] -> [L, K, C] neighbor features."""
    return h[e_idx]


class PositionWiseFeedForward(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.hidden * 4, name="W_in")(x)
        return nn.Dense(self.hidden, name="W_out")(jax.nn.gelu(
            h, approximate=False))


class EncLayer(nn.Module):
    """Node + edge update (the published EncLayer): 3-linear GELU message
    MLP over [h_V_i | h_E | h_V_j], sum over neighbors / scale (=30
    regardless of K, as published), residual+LayerNorm, position-wise FFN,
    then the mirrored edge update (W11-W13)."""

    hidden: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_v: Array, h_e: Array, e_idx: Array,
                 mask: Array, mask_attend: Array) -> Tuple[Array, Array]:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)
        h_vj = gather_nodes(h_v, e_idx)
        h_vi = jnp.broadcast_to(h_v[:, None], h_vj.shape)
        h_ev = jnp.concatenate([h_vi, h_e, h_vj], -1)
        m = nn.Dense(self.hidden, name="W3")(jax.nn.gelu(
            nn.Dense(self.hidden, name="W2")(jax.nn.gelu(
                nn.Dense(self.hidden, name="W1")(h_ev),
                approximate=False)), approximate=False))
        m = m * mask_attend[..., None]
        h_v = ln("norm1")(h_v + jnp.sum(m, -2) / self.scale)
        h_v = ln("norm2")(h_v + PositionWiseFeedForward(
            self.hidden, name="dense")(h_v))
        h_v = h_v * mask[:, None]

        h_vj = gather_nodes(h_v, e_idx)
        h_vi = jnp.broadcast_to(h_v[:, None], h_vj.shape)
        h_ev = jnp.concatenate([h_vi, h_e, h_vj], -1)
        me = nn.Dense(self.hidden, name="W13")(jax.nn.gelu(
            nn.Dense(self.hidden, name="W12")(jax.nn.gelu(
                nn.Dense(self.hidden, name="W11")(h_ev),
                approximate=False)), approximate=False))
        h_e = ln("norm3")(h_e + me) * mask_attend[..., None]
        return h_v, h_e


class DecLayer(nn.Module):
    """Decoder node update over pre-mixed causal edge context
    [h_E | h_S_or_0 | h_V_j] (the published DecLayer)."""

    hidden: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_v: Array, h_esv: Array, mask: Array,
                 mask_attend: Array) -> Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)
        h_vi = jnp.broadcast_to(h_v[:, None], h_esv.shape[:-1]
                                + (h_v.shape[-1],))
        h_in = jnp.concatenate([h_vi, h_esv], -1)
        m = nn.Dense(self.hidden, name="W3")(jax.nn.gelu(
            nn.Dense(self.hidden, name="W2")(jax.nn.gelu(
                nn.Dense(self.hidden, name="W1")(h_in),
                approximate=False)), approximate=False))
        m = m * mask_attend[..., None]
        h_v = ln("norm1")(h_v + jnp.sum(m, -2) / self.scale)
        h_v = ln("norm2")(h_v + PositionWiseFeedForward(
            self.hidden, name="dense")(h_v))
        return h_v * mask[:, None]


class CAProteinMPNN(nn.Module):
    """CA-only ProteinMPNN: featurize -> encode -> causal decode.

    Unbatched core ([L, 3] coords); `vmap` for batches. All methods take a
    decoding `order` ([L] permutation) — scoring conditions each position
    on the positions earlier in the order, exactly the published
    order-agnostic autoregression.
    """

    hidden: int = 128
    k: int = 48
    n_enc: int = 3
    n_dec: int = 3
    vocab: int = len(ALPHABET)

    def setup(self):
        self.pos_enc = nn.Dense(16, name="pos_enc")
        self.edge_embedding = nn.Dense(self.hidden, use_bias=False,
                                       name="edge_embedding")
        self.norm_edges = nn.LayerNorm(epsilon=1e-5, name="norm_edges")
        self.W_e = nn.Dense(self.hidden, name="W_e")
        self.W_s = nn.Embed(self.vocab, self.hidden, name="W_s")
        self.enc = [EncLayer(self.hidden, name=f"enc_{i}")
                    for i in range(self.n_enc)]
        self.dec = [DecLayer(self.hidden, name=f"dec_{i}")
                    for i in range(self.n_dec)]
        self.W_out = nn.Dense(self.vocab, name="W_out")

    def _features(self, coords: Array, mask: Array
                  ) -> Tuple[Array, Array, Array]:
        e_idx, mask_attend = knn_graph(coords, mask, self.k)

        def shifted_coords(s):
            # neighbor-in-chain coords; where the chain ends (array edge
            # OR a masked/padded position) fall back to the residue
            # itself -> features stay pure distances and padding-invariant
            if s == 0:
                return coords
            xs = _shift(coords, s)
            pad = jnp.zeros((abs(s),), mask.dtype)
            ms = jnp.concatenate([pad, mask[:s]] if s < 0
                                 else [mask[s:], pad], 0)
            return jnp.where((ms > 0)[:, None], xs, coords)

        shifted = {s: shifted_coords(s) for s in (-1, 0, 1)}
        rbfs = []
        for si, sj in SHIFT_PAIRS:
            a = shifted[si]                       # [L, 3] at node i
            b = shifted[sj][e_idx]                # [L, K, 3] at neighbor j
            rbfs.append(_rbf(jnp.sqrt(
                jnp.sum((a[:, None] - b) ** 2, -1) + 1e-8)))
        L = coords.shape[0]
        offset = jnp.clip(e_idx - jnp.arange(L)[:, None],
                          -MAX_REL_OFFSET, MAX_REL_OFFSET) + MAX_REL_OFFSET
        onehot = jax.nn.one_hot(offset, 2 * MAX_REL_OFFSET + 2)
        e = jnp.concatenate([self.pos_enc(onehot)] + rbfs, -1)
        e = self.norm_edges(self.edge_embedding(e))
        return self.W_e(e), e_idx, mask_attend

    def encode(self, coords: Array, mask: Array
               ) -> Tuple[Array, Array, Array, Array]:
        h_e, e_idx, mask_attend = self._features(coords, mask)
        h_v = jnp.zeros((coords.shape[0], self.hidden))
        for layer in self.enc:
            h_v, h_e = layer(h_v, h_e, e_idx, mask, mask_attend)
        return h_v, h_e, e_idx, mask_attend

    def __call__(self, coords: Array, tokens: Array, order: Array,
                 mask: Optional[Array] = None) -> Array:
        """Teacher-forced conditional log-probs: [L, vocab] log-softmax
        rows, row i conditioned on the true tokens at positions earlier
        than i in `order` (a position never sees its own token)."""
        if mask is None:
            mask = jnp.ones(coords.shape[0], coords.dtype)
        h_v, h_e, e_idx, mask_attend = self.encode(coords, mask)
        return self.decode(h_v, h_e, e_idx, mask, mask_attend, tokens,
                           order)

    def decode(self, h_v: Array, h_e: Array, e_idx: Array, mask: Array,
               mask_attend: Array, tokens: Array, order: Array) -> Array:
        L = h_v.shape[0]
        rank = jnp.zeros(L, jnp.int32).at[order].set(jnp.arange(L,
                                                                dtype=jnp.int32))
        # neighbor j visible to i iff decoded strictly earlier
        mask_bw = (rank[e_idx] < rank[:, None]).astype(h_v.dtype) \
            * mask_attend
        h_s = self.W_s(tokens)
        h_es = jnp.concatenate([h_e, h_s[e_idx]], -1)
        zeros = jnp.zeros_like(h_s[e_idx])
        # future/unknown neighbors contribute their ENCODER state, no seq
        h_exv_enc = jnp.concatenate([h_e, zeros, gather_nodes(h_v, e_idx)],
                                    -1) * (1.0 - mask_bw)[..., None] \
            * mask_attend[..., None]
        for layer in self.dec:
            h_esv = jnp.concatenate([h_es, gather_nodes(h_v, e_idx)], -1) \
                * mask_bw[..., None] + h_exv_enc
            h_v = layer(h_v, h_esv, mask, mask_attend)
        return jax.nn.log_softmax(self.W_out(h_v), -1)


def make_mpnn_fns(model: CAProteinMPNN, params):
    """Jitted (score, sample) closures (re-traced per structure length).

    score(coords, tokens, order, mask) -> [L, vocab] log-probs.
    sample(coords, order, key, mask, temperature=...) -> [L] tokens,
    decoded autoregressively along `order` via a `lax.scan` of
    teacher-forced decode passes (exact: the causal mask hides every
    not-yet-written token). The encoder runs ONCE — only the decoder
    repeats per step.
    """

    def score(coords, tokens, order, mask):
        return model.apply(params, coords, tokens, order, mask)

    def sample(coords, order, key, mask, init_tokens, fixed_mask,
               temperature=0.1):
        L = coords.shape[0]
        h_v, h_e, e_idx, mask_attend = model.apply(
            params, coords, mask, method=CAProteinMPNN.encode)

        def step(carry, t):
            tokens, key = carry
            lp = model.apply(params, h_v, h_e, e_idx, mask, mask_attend,
                             tokens, order, method=CAProteinMPNN.decode)
            p = order[t]
            key, k = jax.random.split(key)
            tok = jax.random.categorical(k, lp[p] / temperature)
            # fixed (motif) positions keep their given identity
            tok = jnp.where(fixed_mask[p] > 0, tokens[p], tok)
            return (tokens.at[p].set(tok), key), None

        (tokens, _), _ = jax.lax.scan(step, (init_tokens, key),
                                      jnp.arange(L))
        return tokens

    return jax.jit(score), jax.jit(sample, static_argnames="temperature")


class MPNNScorer(ProteinMPNNScorer):
    """`ProteinMPNNScorer` adapter: numpy in/out, seed -> decoding order,
    per-length jit cache. Drop-in for the self-consistency stage
    (reference evaluation_pipeline.py:452-513)."""

    def __init__(self, model: CAProteinMPNN, params,
                 temperature: float = 0.1):
        self.model, self.params = model, params
        self.temperature = float(temperature)
        self._score, self._sample = make_mpnn_fns(model, params)

    def _order(self, length: int, seed: int,
               fixed_mask: Optional[np.ndarray] = None):
        perm = np.asarray(
            jax.random.permutation(jax.random.PRNGKey(seed), length))
        if fixed_mask is None:
            return jnp.asarray(perm)
        # fixed (motif) positions decode first -> every designed position
        # conditions on the whole motif (reference create_backbone
        # res_mask semantics, evaluation_pipeline.py:434-449)
        fixed = np.asarray(fixed_mask)[perm] > 0
        return jnp.asarray(np.concatenate([perm[fixed], perm[~fixed]]))

    def sample(self, coords: np.ndarray, seed: int = 0,
               fixed_tokens: Optional[np.ndarray] = None,
               fixed_mask: Optional[np.ndarray] = None) -> np.ndarray:
        coords = jnp.asarray(coords, jnp.float32)
        L = coords.shape[0]
        if fixed_mask is None:
            fixed_mask = np.zeros(L, np.float32)
        init = np.zeros(L, np.int32)
        if fixed_tokens is not None:
            init = np.where(np.asarray(fixed_mask) > 0,
                            np.asarray(fixed_tokens, np.int32), init)
        tokens = self._sample(coords, self._order(L, seed, fixed_mask),
                              jax.random.PRNGKey(seed + 1),
                              jnp.ones(L, jnp.float32),
                              jnp.asarray(init),
                              jnp.asarray(fixed_mask, jnp.float32),
                              temperature=self.temperature)
        return np.asarray(tokens)

    def log_probs(self, coords: np.ndarray, tokens: np.ndarray,
                  seed: int = 0) -> np.ndarray:
        coords = jnp.asarray(coords, jnp.float32)
        L = coords.shape[0]
        lp = self._score(coords, jnp.asarray(tokens, jnp.int32),
                         self._order(L, seed), jnp.ones(L, jnp.float32))
        return np.asarray(lp)


def load_mpnn_scorer(npz_path: Optional[str] = None, hidden: int = 128,
                     k: int = 48, seed: int = 0,
                     temperature: float = 0.1) -> MPNNScorer:
    """Build the CA ProteinMPNN scorer: random-init (deterministic in
    `seed`; NOT the published model — results are self-consistent only,
    like eval/inception.py's random features) or from a converted-weights
    .npz (see `convert_mpnn_state_dict`)."""
    model = CAProteinMPNN(hidden=hidden, k=k)
    probe = jnp.zeros((8, 3))
    params = model.init(jax.random.PRNGKey(seed), probe,
                        jnp.zeros(8, jnp.int32), jnp.arange(8),
                        jnp.ones(8))
    if npz_path is not None:
        loaded = np.load(npz_path)
        flat = {"/".join(str(p.key) for p in kp): leaf for kp, leaf in
                jax.tree_util.tree_flatten_with_path(params)[0]}
        missing = sorted(set(flat) - set(loaded.files))
        if missing:
            raise KeyError(f"mpnn npz missing {len(missing)} entries, "
                           f"e.g. {missing[:3]}")
        for name, leaf in flat.items():
            if loaded[name].shape != leaf.shape:
                raise ValueError(f"{name}: npz shape {loaded[name].shape} "
                                 f"!= model {leaf.shape}")
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [jnp.asarray(loaded["/".join(str(p.key) for p in kp)])
             for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]])
    return MPNNScorer(model, params, temperature=temperature)


# --- public-checkpoint conversion -----------------------------------------

_TORCH_TO_FLAX = {
    "features.embeddings.linear": ("params", "pos_enc"),
    "features.edge_embedding": ("params", "edge_embedding"),
    "features.norm_edges": ("params", "norm_edges"),
    "W_e": ("params", "W_e"),
    "W_s": ("params", "W_s"),
    "W_out": ("params", "W_out"),
}


def _layer_maps():
    maps = dict(_TORCH_TO_FLAX)
    for i in range(3):
        for w in ("W1", "W2", "W3", "W11", "W12", "W13"):
            maps[f"encoder_layers.{i}.{w}"] = ("params", f"enc_{i}", w)
        for n in ("norm1", "norm2", "norm3"):
            maps[f"encoder_layers.{i}.{n}"] = ("params", f"enc_{i}", n)
        maps[f"encoder_layers.{i}.dense.W_in"] = \
            ("params", f"enc_{i}", "dense", "W_in")
        maps[f"encoder_layers.{i}.dense.W_out"] = \
            ("params", f"enc_{i}", "dense", "W_out")
        for w in ("W1", "W2", "W3"):
            maps[f"decoder_layers.{i}.{w}"] = ("params", f"dec_{i}", w)
        for n in ("norm1", "norm2"):
            maps[f"decoder_layers.{i}.{n}"] = ("params", f"dec_{i}", n)
        maps[f"decoder_layers.{i}.dense.W_in"] = \
            ("params", f"dec_{i}", "dense", "W_in")
        maps[f"decoder_layers.{i}.dense.W_out"] = \
            ("params", f"dec_{i}", "dense", "W_out")
    return maps


def convert_mpnn_state_dict(state_dict) -> dict:
    """Public ProteinMPNN torch state-dict (name -> array) -> this module's
    parameter tree. Linear weights transpose [out,in] -> [in,out]; the
    embedding (`W_s.weight`) and LayerNorm weights map as-is. Unknown or
    missing names raise — a partial import must fail loudly.

    Layout reference: the released `ca_model_weights/*.pt` checkpoints
    (keys like `encoder_layers.0.W1.weight`, `features.edge_embedding.
    weight`); validated structurally in tests/test_mpnn.py with a
    synthetic state dict of the published shapes.
    """
    maps = _layer_maps()
    tree: dict = {}
    consumed = set()
    for torch_name, path in maps.items():
        for suffix in ("weight", "bias"):
            key = f"{torch_name}.{suffix}"
            if key not in state_dict:
                continue
            arr = np.asarray(state_dict[key])
            if path[-1] == "W_s":
                leaf_name = "embedding"          # nn.Embed
            elif suffix == "weight":
                leaf_name = "scale" if "norm" in path[-1] else "kernel"
            else:
                leaf_name = "bias"
            if leaf_name == "kernel" and arr.ndim == 2:
                arr = arr.T
            node = tree
            for p in path:
                node = node.setdefault(p, {})
            node[leaf_name] = jnp.asarray(arr)
            consumed.add(key)
    unknown = sorted(set(state_dict) - consumed)
    if unknown:
        raise KeyError(f"unmapped state-dict entries: {unknown[:5]} "
                       f"(+{max(0, len(unknown) - 5)} more)")
    return tree
