"""CA-ProteinMPNN: invariances, causality, conversion contract.

No pretrained weights exist in this environment, so correctness is pinned
through properties that must hold for ANY weights: SE(3) invariance of the
conditional distribution, exact autoregressive causality of the decoding
order, seed determinism, and the public-checkpoint state-dict conversion
contract (shapes/naming), plus integration with the self-consistency
stage it was built to serve (reference evaluation_pipeline.py:452-513).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.protein.mpnn import (CAProteinMPNN, MPNNScorer,
                                        convert_mpnn_state_dict,
                                        load_mpnn_scorer)

L = 14


@pytest.fixture(scope="module")
def scorer():
    # tiny dims so the module compiles in seconds on the CPU mesh
    return load_mpnn_scorer(hidden=32, k=6, seed=0)


@pytest.fixture(scope="module")
def coords():
    rng = np.random.default_rng(0)
    # a loose helix-ish chain with ~3.8 A steps, like real CA traces
    t = np.arange(L)
    base = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * t], -1)
    return (base + rng.normal(0, 0.3, (L, 3))).astype(np.float32)


def test_sample_and_score_shapes(scorer, coords):
    tokens = scorer.sample(coords, seed=3)
    assert tokens.shape == (L,) and tokens.dtype.kind == "i"
    assert tokens.min() >= 0 and tokens.max() < 21
    lp = scorer.log_probs(coords, tokens, seed=1)
    assert lp.shape == (L, 21)
    # rows are log-softmax
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-5)


def test_seed_determinism(scorer, coords):
    a = scorer.sample(coords, seed=7)
    b = scorer.sample(coords, seed=7)
    np.testing.assert_array_equal(a, b)
    la = scorer.log_probs(coords, a, seed=2)
    lb = scorer.log_probs(coords, a, seed=2)
    np.testing.assert_array_equal(la, lb)


def test_se3_invariance(scorer, coords):
    """Features are pure distances + sequence offsets, so any rigid motion
    of the backbone must leave the conditional log-probs unchanged."""
    tokens = scorer.sample(coords, seed=0)
    lp = scorer.log_probs(coords, tokens, seed=5)
    # a random rotation (QR of a Gaussian) + translation
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    moved = coords @ q.T.astype(np.float32) + np.float32([10., -5., 3.])
    lp2 = scorer.log_probs(moved, tokens, seed=5)
    np.testing.assert_allclose(lp, lp2, atol=2e-4)


def test_autoregressive_causality(scorer, coords):
    """Position i's log-probs depend ONLY on tokens decoded before i in
    the order: perturbing a later-order token must not change row i, and
    a position never conditions on its own token."""
    seed = 4
    order = np.asarray(jax.random.permutation(jax.random.PRNGKey(seed), L))
    rank = np.empty(L, np.int64)
    rank[order] = np.arange(L)
    tokens = scorer.sample(coords, seed=0)
    lp = scorer.log_probs(coords, tokens, seed=seed)

    mid = order[L // 2]                       # decoded at rank L//2
    later = order[-1]                         # decoded last
    tweaked = tokens.copy()
    tweaked[later] = (tweaked[later] + 5) % 21
    tweaked[mid] = (tweaked[mid] + 5) % 21    # own token: also invisible
    lp2 = scorer.log_probs(coords, tweaked, seed=seed)
    np.testing.assert_allclose(lp[mid], lp2[mid], atol=1e-6)

    # and perturbing an EARLIER token must change some later row
    early = order[0]
    tweaked = tokens.copy()
    tweaked[early] = (tweaked[early] + 5) % 21
    lp3 = scorer.log_probs(coords, tweaked, seed=seed)
    later_rows = order[1:]
    assert np.abs(lp[later_rows] - lp3[later_rows]).max() > 1e-6


def test_structure_dependence(scorer, coords):
    """Different backbones get different designs/likelihoods (the stub
    scorer's property, now from a real message-passing model)."""
    rng = np.random.default_rng(9)
    other = (coords + rng.normal(0, 2.0, coords.shape)).astype(np.float32)
    tokens = scorer.sample(coords, seed=0)
    lp_a = scorer.log_probs(coords, tokens, seed=0)
    lp_b = scorer.log_probs(other, tokens, seed=0)
    assert np.abs(lp_a - lp_b).max() > 1e-3


def test_integrates_with_self_consistency_stage(scorer, coords, tmp_path):
    from tpu_diffusion.protein.self_consistency import (proteinmpnn_scores,
                                                        self_consistency_eval)
    scores, seqs = proteinmpnn_scores(coords, scorer, n_seq=3)
    assert scores.shape == (3,)
    assert np.all((scores > 0) & (scores <= 1))   # exp(-NLL)
    assert len({len(s) for s in seqs}) == 1 and len(seqs[0]) == L

    rows = self_consistency_eval({"s0": coords}, str(tmp_path),
                                 scorer=scorer, n_seq=2, run_fold=False)
    assert rows[0]["protein_mpnn_scores"] is not None
    assert (tmp_path / "protein_mpnn_seqs.csv").exists()


def test_motif_fixed_design(scorer, coords):
    """Reference motif semantics (evaluation_pipeline.py:434-482): motif
    residues keep their native identity during design, decode before every
    designable position, and are INCLUDED in the NLL (the reference scores
    with the validity mask `inpt["mask"]`, :476 — not res_mask)."""
    from tpu_diffusion.protein.self_consistency import (ALPHABET,
                                                        proteinmpnn_scores)
    motif_inds = [2, 5, 9]
    motif_res = "WHY"
    scores, seqs = proteinmpnn_scores(coords, scorer, n_seq=2,
                                      motif_inds=motif_inds,
                                      motif_res=motif_res)
    for seq in seqs:
        assert [seq[i] for i in motif_inds] == list(motif_res)
    assert np.all((scores > 0) & (scores <= 1))

    # mismatched / absent motif_res is a hard error, not silent truncation
    with pytest.raises(ValueError):
        proteinmpnn_scores(coords, scorer, n_seq=1, motif_inds=motif_inds,
                           motif_res="WH")
    with pytest.raises(ValueError):
        proteinmpnn_scores(coords, scorer, n_seq=1, motif_inds=motif_inds,
                           motif_res=None)

    # all-residue scoring: the motif-mode score must equal re-scoring the
    # SAME tokens with no design_mask restriction (exp(-NLL) over every
    # residue), i.e. motif positions are not excluded.
    ft = np.zeros(L, np.int32)
    fm = np.zeros(L, np.float32)
    for i, r in zip(motif_inds, motif_res):
        ft[i] = ALPHABET.index(r)
        fm[i] = 1.0
    tok = scorer.sample(coords, seed=0, fixed_tokens=ft, fixed_mask=fm)
    from tpu_diffusion.protein.self_consistency import nll_score
    lp = scorer.log_probs(coords, tok, seed=0)
    expected = float(np.exp(-nll_score(tok, lp, None)))
    assert np.isclose(scores[0], expected, rtol=1e-6)

    # fixing the motif changes what gets designed elsewhere vs free design
    free = scorer.sample(coords, seed=0)
    fixed_mask = np.zeros(L, np.float32)
    fixed_mask[motif_inds] = 1
    fixed_tokens = np.zeros(L, np.int32)
    for i, r in zip(motif_inds, motif_res):
        fixed_tokens[i] = ALPHABET.index(r)
    cond = scorer.sample(coords, seed=0, fixed_tokens=fixed_tokens,
                         fixed_mask=fixed_mask)
    assert np.all(cond[motif_inds] == fixed_tokens[motif_inds])
    assert cond.shape == free.shape


def _synthetic_state_dict(hidden=32, vocab=21):
    """The released checkpoint layout (ca_model_weights/*.pt keys) at tiny
    dims: every Linear as [out, in] + bias, LayerNorms, the embedding."""
    rng = np.random.default_rng(0)
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (dout, din))
        if bias:
            sd[f"{name}.bias"] = rng.normal(0, 0.05, (dout,))

    def ln(name, d):
        sd[f"{name}.weight"] = np.ones(d)
        sd[f"{name}.bias"] = np.zeros(d)

    edge_in = 16 + 9 * 16
    lin("features.embeddings.linear", 66, 16)
    lin("features.edge_embedding", edge_in, hidden, bias=False)
    ln("features.norm_edges", hidden)
    lin("W_e", hidden, hidden)
    sd["W_s.weight"] = rng.normal(0, 0.05, (vocab, hidden))
    for i in range(3):
        for w, din in (("W1", 3 * hidden), ("W2", hidden), ("W3", hidden),
                       ("W11", 3 * hidden), ("W12", hidden),
                       ("W13", hidden)):
            lin(f"encoder_layers.{i}.{w}", din, hidden)
        for n in ("norm1", "norm2", "norm3"):
            ln(f"encoder_layers.{i}.{n}", hidden)
        lin(f"encoder_layers.{i}.dense.W_in", hidden, 4 * hidden)
        lin(f"encoder_layers.{i}.dense.W_out", 4 * hidden, hidden)
        for w, din in (("W1", 4 * hidden), ("W2", hidden), ("W3", hidden)):
            lin(f"decoder_layers.{i}.{w}", din, hidden)
        for n in ("norm1", "norm2"):
            ln(f"decoder_layers.{i}.{n}", hidden)
        lin(f"decoder_layers.{i}.dense.W_in", hidden, 4 * hidden)
        lin(f"decoder_layers.{i}.dense.W_out", 4 * hidden, hidden)
    lin("W_out", hidden, vocab)
    return sd


@pytest.mark.slow  # compiles two extra model instances (~37 s on this host)
def test_state_dict_conversion_roundtrip(tmp_path, coords):
    """The converter consumes EXACTLY the public layout (unknown keys
    raise), produces a tree the model runs with, and the npz loader
    round-trips it — the contract a real ca_model_weights import must
    satisfy."""
    sd = _synthetic_state_dict(hidden=32)
    params = convert_mpnn_state_dict(sd)
    model = CAProteinMPNN(hidden=32, k=6)
    scorer = MPNNScorer(model, params)
    tokens = scorer.sample(coords, seed=0)
    lp = scorer.log_probs(coords, tokens, seed=0)
    assert np.all(np.isfinite(lp))

    # converted weights actually differ from a random init
    other = load_mpnn_scorer(hidden=32, k=6, seed=0)
    assert np.abs(lp - other.log_probs(coords, tokens, seed=0)).max() > 1e-3

    # npz round trip through load_mpnn_scorer
    flat = {"/".join(str(p.key) for p in kp): np.asarray(leaf)
            for kp, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    path = str(tmp_path / "mpnn.npz")
    np.savez(path, **flat)
    loaded = load_mpnn_scorer(npz_path=path, hidden=32, k=6)
    np.testing.assert_allclose(loaded.log_probs(coords, tokens, seed=0),
                               lp, atol=1e-6)

    # unknown keys must fail loudly
    sd_bad = dict(sd)
    sd_bad["decoder_layers.0.W4.weight"] = np.zeros((2, 2))
    with pytest.raises(KeyError):
        convert_mpnn_state_dict(sd_bad)

    # wrong-shape npz must fail loudly
    flat_bad = dict(flat)
    k0 = next(k for k in flat_bad if flat_bad[k].ndim == 2)
    flat_bad[k0] = flat_bad[k0][:, :1]
    badpath = str(tmp_path / "bad.npz")
    np.savez(badpath, **flat_bad)
    with pytest.raises(ValueError):
        load_mpnn_scorer(npz_path=badpath, hidden=32, k=6)


@pytest.mark.slow  # compiles the padded-length graph (~26 s on this host)
def test_padding_invariance(scorer, coords):
    """Padded positions (mask 0) must not change real positions' rows —
    checked through the module API with an explicit mask."""
    model, params = scorer.model, scorer.params
    tokens = jnp.asarray(scorer.sample(coords, seed=0))
    order = jnp.asarray(
        jax.random.permutation(jax.random.PRNGKey(2), L))
    lp = model.apply(params, jnp.asarray(coords), tokens, order,
                     jnp.ones(L))

    pad = 5
    coords_p = jnp.concatenate(
        [jnp.asarray(coords), 7.0 + jnp.zeros((pad, 3))], 0)
    tokens_p = jnp.concatenate([tokens, jnp.zeros(pad, jnp.int32)], 0)
    # padded positions decode LAST so real ranks are unchanged
    order_p = jnp.concatenate([order, L + jnp.arange(pad)], 0)
    mask_p = jnp.concatenate([jnp.ones(L), jnp.zeros(pad)], 0)
    lp_p = model.apply(params, coords_p, tokens_p, order_p, mask_p)
    np.testing.assert_allclose(np.asarray(lp_p[:L]), np.asarray(lp),
                               atol=2e-4)
