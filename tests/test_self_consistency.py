"""ProteinMPNN/ColabFold self-consistency stage tests (stub-backed).

The real tools don't exist in this environment; these tests drive the full
stage path — design -> NLL scoring -> seqs CSV -> refold subprocess ->
pLDDT/PAE/pTM extraction -> scTM/scRMSD — against a deterministic stub
scorer and a fake `colabfold_batch` executable, per VERDICT r2 item 6.
Reference stage logic: evaluation_pipeline.py:453-573,705-712.
"""

import csv
import json
import os
import stat
import sys
import textwrap

import numpy as np
import pytest

from tpu_diffusion.protein.self_consistency import (
    ALPHABET, StubScorer, load_proteinmpnn_scorer, nll_score,
    process_af2_output, proteinmpnn_scores, run_proteinmpnn_eval,
    self_consistency_eval, untokenise, write_seqs_csv)

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def helix(n):
    i = np.arange(n, dtype=np.float64)
    return np.stack([2.3 * np.cos(0.6 * i), 2.3 * np.sin(0.6 * i),
                     1.5 * i], -1)


def test_nll_score_manual():
    lp = np.log(np.array([[0.5, 0.25, 0.25],
                          [0.1, 0.8, 0.1],
                          [0.3, 0.3, 0.4]]))
    tokens = np.array([0, 1, 2])
    expected = -(np.log(0.5) + np.log(0.8) + np.log(0.4)) / 3
    assert abs(nll_score(tokens, lp) - expected) < 1e-12
    # mask drops position 2
    expected_m = -(np.log(0.5) + np.log(0.8)) / 2
    assert abs(nll_score(tokens, lp, np.array([1, 1, 0])) - expected_m) \
        < 1e-12


def test_stub_scorer_deterministic_and_structured():
    coords = helix(40)
    s = StubScorer()
    t1, t2 = s.sample(coords, seed=0), s.sample(coords, seed=0)
    np.testing.assert_array_equal(t1, t2)
    lp = s.log_probs(coords, t1, seed=1)
    assert lp.shape == (40, len(ALPHABET))
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-9)
    # different structures -> different designs (note: scaling alone is
    # argmax-invariant for the stub's linear logits, so translate instead)
    other = helix(40) + np.array([5.0, -3.0, 2.0])
    assert not np.array_equal(t1, s.sample(other, seed=0))


def test_proteinmpnn_scores_shapes_and_range():
    scores, seqs = proteinmpnn_scores(helix(25), StubScorer(), n_seq=4)
    assert scores.shape == (4,)
    assert ((scores > 0) & (scores <= 1)).all()
    assert len(seqs) == 4 and all(len(q) == 25 for q in seqs)
    assert all(set(q) <= set(ALPHABET) for q in seqs)


def test_seqs_csv_format(tmp_path):
    structures = {"sample_a": helix(10), "sample_b": helix(12)}
    _, seqs = run_proteinmpnn_eval(structures, StubScorer(), n_seq=2)
    path = str(tmp_path / "protein_mpnn_seqs.csv")
    write_seqs_csv(seqs, path)
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["id", "sequence"]
    assert [r[0] for r in rows[1:]] == ["sample0_0", "sample0_1",
                                        "sample1_0", "sample1_1"]
    assert len(rows[1][1]) == 10 and len(rows[3][1]) == 12


FAKE_COLABFOLD = textwrap.dedent("""\
    #!%PY%
    import csv, json, math, sys
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seqs_csv, out_dir = args
    import os
    os.makedirs(out_dir, exist_ok=True)
    with open(seqs_csv) as f:
        rows = list(csv.DictReader(f))
    for row in rows:
        sid, seq = row["id"], row["sequence"]
        L = len(seq)
        with open(os.path.join(
                out_dir, sid + "_scores_rank_001_fake_model.json"),
                "w") as f:
            json.dump({"plddt": [80.0 + (i % 5) for i in range(L)],
                       "max_pae": 4.5, "ptm": 0.87}, f)
        lines = []
        for i in range(L):
            x = 2.3 * math.cos(0.6 * i)
            y = 2.3 * math.sin(0.6 * i)
            z = 1.5 * i
            lines.append(
                "ATOM  %5d  CA  ALA A%4d    %8.3f%8.3f%8.3f"
                "  1.00  0.00           C" % (i + 1, i + 1, x, y, z))
        lines.append("END")
        with open(os.path.join(
                out_dir, sid + "_relaxed_rank_001_fake_model.pdb"),
                "w") as f:
            f.write("\\n".join(lines) + "\\n")
    """)


@pytest.fixture
def fake_colabfold(tmp_path):
    path = tmp_path / "colabfold_batch"
    path.write_text(FAKE_COLABFOLD.replace("%PY%", sys.executable))
    path.chmod(path.stat().st_mode | stat.S_IXUSR)
    return str(path)


def test_full_stage_with_fake_colabfold(tmp_path, fake_colabfold):
    sample_dir = str(tmp_path / "samples")
    os.makedirs(sample_dir)
    structures = {"sample_000": helix(20), "sample_001": helix(30)}

    rows = self_consistency_eval(structures, sample_dir,
                                 scorer=StubScorer(), n_seq=2,
                                 colabfold_executable=fake_colabfold)
    assert len(rows) == 2
    for row in rows:
        assert len(row["protein_mpnn_scores"]) == 2
        assert len(row["protein_mpnn_seqs"]) == 2
        # fake refolder: plddt mean of 80..84 pattern, ptm 0.87
        assert all(79.0 < v < 85.0 for v in row["plddt"])
        assert row["pTM"] == [0.87, 0.87]
        assert row["max_pae"] == [4.5, 4.5]
        # fake prediction IS the sampled helix -> near-perfect refold
        assert row["scRMSD"] < 0.01
        assert row["scTM"] > 0.99
    assert os.path.exists(os.path.join(sample_dir,
                                       "protein_mpnn_seqs.csv"))
    assert os.path.isdir(os.path.join(sample_dir, "af2_output"))


def test_process_af2_output_missing_files(tmp_path):
    """No JSONs/PDBs -> empty lists + NaN geometry, no crash (:556-567)."""
    af2 = process_af2_output(str(tmp_path), {"s0": helix(8)}, n_seq=2)
    assert af2["plddt"] == [[]]
    assert np.isnan(af2["scTM"][0]) and np.isnan(af2["scRMSD"][0])


def test_stage_skips_cleanly_without_tools(tmp_path):
    assert load_proteinmpnn_scorer() is None  # not in this environment
    rows = self_consistency_eval({"s0": helix(10)}, str(tmp_path),
                                 scorer=None, run_fold=False)
    assert rows == [{}]


def test_untokenise_roundtrip():
    tokens = np.arange(len(ALPHABET))
    assert untokenise(tokens) == ALPHABET
