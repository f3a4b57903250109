"""Native novelty kernel vs numpy reference semantics."""

import numpy as np
import pytest

from tpu_diffusion.protein import novelty
from tpu_diffusion.protein.novelty import (_np_kabsch_alignment,
                                           find_closest_structure,
                                           gdt_score, kabsch_alignment,
                                           rmsd, tm_score)


@pytest.fixture(scope="module")
def have_native():
    return novelty._lib() is not None


def _rot(seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    return q * np.linalg.det(q)


def test_native_library_builds(have_native):
    assert have_native, "C++ novelty kernel failed to build with g++"


def test_kabsch_alignment_native_matches_numpy():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(30, 3))
    q = p @ _rot(1).T + np.array([1.0, 2.0, 3.0])
    a_native = kabsch_alignment(p, q)
    a_np = _np_kabsch_alignment(p, q)
    np.testing.assert_allclose(a_native, a_np, atol=1e-8)
    np.testing.assert_allclose(a_native, q, atol=1e-8)


def test_rmsd_definition():
    p = np.zeros((5, 3))
    q = np.ones((5, 3)) * 2.0
    assert rmsd(p, q) == pytest.approx(2.0)


def test_tm_score_perfect_and_worse():
    rng = np.random.default_rng(2)
    p = rng.normal(size=(50, 3)) * 10
    assert tm_score(p, p) == pytest.approx(1.0)
    assert tm_score(p, p + 5.0) < 0.6


def test_gdt_score_range():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(20, 3)) * 10
    assert gdt_score(p, p) == pytest.approx(1.0)
    far = p + 100.0
    assert gdt_score(p, far) == pytest.approx(0.0)


def test_find_closest_identifies_rotated_copy():
    rng = np.random.default_rng(4)
    target = rng.normal(size=(40, 3)) * 5
    train = {
        "a": rng.normal(size=(40, 3)) * 5,
        "b": target @ _rot(5).T + 3.0,  # rotated/translated copy
        "c": rng.normal(size=(40, 3)) * 5,
    }
    out = find_closest_structure(target, train)
    assert out["rmsd_match"] == "b"
    assert out["rmsd"] == pytest.approx(0.0, abs=1e-6)
    assert out["tm_score_match"] == "b"
    assert out["tm_score"] == pytest.approx(1.0, abs=1e-6)


def test_find_closest_sliding_window():
    rng = np.random.default_rng(6)
    long = rng.normal(size=(60, 3)) * 5
    query = long[17:47]  # a 30-residue window
    out = find_closest_structure(query, {"x": long,
                                         "y": rng.normal(size=(30, 3))})
    assert out["rmsd"] == pytest.approx(0.0, abs=1e-6)
    assert out["rmsd_match"] == "x_17"


def test_find_closest_query_longer_than_sample():
    rng = np.random.default_rng(7)
    query = rng.normal(size=(50, 3)) * 5
    sample = query[10:30].copy()
    out = find_closest_structure(query, {"s": sample})
    assert out["rmsd"] == pytest.approx(0.0, abs=1e-6)
    assert out["rmsd_match"] == "s^10"


def test_native_matches_numpy_find_closest(have_native):
    if not have_native:
        pytest.skip("no compiler")
    rng = np.random.default_rng(8)
    query = rng.normal(size=(20, 3)) * 3
    train = {f"t{i}": rng.normal(size=(rng.integers(18, 25), 3)) * 3
             for i in range(4)}
    keys = list(train)
    got = find_closest_structure(query, train)
    want = novelty._np_find_closest(
        query.astype(np.float64),
        keys, [train[k].astype(np.float64) for k in keys])
    assert got["rmsd"] == pytest.approx(want["rmsd"], abs=1e-6)
    assert got["tm_score"] == pytest.approx(want["tm_score"], abs=1e-6)
    assert got["gdt_score"] == pytest.approx(want["gdt_score"], abs=1e-6)
    assert got["rmsd_match"] == want["rmsd_match"]
