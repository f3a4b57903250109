"""LMDB storage tests (VERDICT r2 item 10).

Covers the pure-Python LMDB format parser/writer (`data/minilmdb.py`), the
`LMDBDataset` fallback path, a checked-in binary fixture
(tests/fixtures/lmdb/data.mdb), and — wherever the real `lmdb` C module is
installed — byte-level cross-validation of both directions (real writes /
mini reads, mini writes / real reads). Reference:
`amortised diffusion/src/utils/lmdb_dataset.py:38-625`.
"""

import os
import pickle

import numpy as np
import pytest

from tpu_diffusion.data.minilmdb import (MiniLMDB, MiniLMDBError,
                                         write_minilmdb)
from tpu_diffusion.data.storage import LMDBDataset

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "lmdb")


def _sample_items(n=40, big=True):
    rng = np.random.default_rng(0)
    items = {f"key_{i:03d}".encode():
             bytes(rng.integers(0, 256, rng.integers(5, 120),
                                dtype=np.uint8))
             for i in range(n)}
    if big:
        # one value large enough for overflow pages
        items[b"key_big"] = bytes(rng.integers(0, 256, 9000,
                                               dtype=np.uint8))
    return items


def test_roundtrip_single_leaf(tmp_path):
    items = {b"a": b"1", b"bb": b"22", b"ccc": b"333"}
    path = write_minilmdb(str(tmp_path / "data.mdb"), items)
    db = MiniLMDB(path)
    assert dict(db.items()) == items
    assert db.get(b"bb") == b"22"
    assert db.get(b"zz") is None
    assert db.main_entries == 3


def test_roundtrip_multi_page_and_overflow(tmp_path):
    items = _sample_items(200, big=True)
    path = write_minilmdb(str(tmp_path / "data.mdb"), items)
    db = MiniLMDB(path)
    got = dict(db.items())
    assert got == items
    # keys come back in sorted order (LMDB invariant)
    assert db.keys() == sorted(items)
    # point lookups through the branch level
    for k in list(items)[::17] + [b"key_big"]:
        assert db.get(k) == items[k]
    assert db.get(b"key_999") is None


def test_empty_db(tmp_path):
    path = write_minilmdb(str(tmp_path / "data.mdb"), {})
    db = MiniLMDB(path)
    assert db.keys() == []
    assert db.get(b"x") is None


def test_not_an_lmdb_file(tmp_path):
    bad = tmp_path / "nope.mdb"
    bad.write_bytes(b"\x00" * 8192)
    with pytest.raises(MiniLMDBError):
        MiniLMDB(str(bad))


def test_lmdb_dataset_fallback_roundtrip(tmp_path):
    """LMDBDataset.write + read through whichever backend is present."""
    payload = {"s0": {"coords": np.arange(12.0).reshape(4, 3)},
               "s1": {"coords": np.ones((3, 3))}}
    path = str(tmp_path / "env")
    LMDBDataset.write(path, payload, serializer="pkl")
    ds = LMDBDataset(path, serializer="pkl")
    assert ds.keys() == ["s0", "s1"]
    np.testing.assert_array_equal(ds["s0"]["coords"],
                                  payload["s0"]["coords"])
    np.testing.assert_array_equal(ds.get("s1")["coords"], np.ones((3, 3)))


def test_checked_in_fixture():
    """The committed fixture (written by scripts/make_lmdb_fixture.py) must
    stay readable — guards the format against regressions."""
    ds = LMDBDataset(FIXTURE, serializer="pkl")
    assert ds.keys() == ["protein_000", "protein_001", "protein_002"]
    item = ds["protein_001"]
    assert item["length"] == 24
    np.testing.assert_allclose(item["coords"].sum(), item["checksum"])


def test_page_size_field_and_detection(tmp_path):
    """mm_psize is the FREE db's pad field (mdb.c); the writer must pack
    it and the reader must auto-detect it — a real-lmdb file from a
    16K-page host must parse without being told the page size."""
    import struct
    items = {b"k%03d" % i: b"v" * (i * 7 % 300) for i in range(40)}
    path = str(tmp_path / "data.mdb")
    for psize in (4096, 16384):
        write_minilmdb(path, items, page_size=psize)
        with open(path, "rb") as f:
            head = f.read(256)
        # FREE db pad field: PAGEHDRSZ(16) + magic/version/address/mapsize
        # (4+4+8+8 = 24) -> offset 40
        assert struct.unpack_from("<I", head, 40)[0] == psize
        db = MiniLMDB(path)  # no page_size hint
        assert db.page_size == psize
        assert dict(db.items()) == items


def test_cross_validate_with_real_lmdb(tmp_path):
    """Runs only where the `lmdb` C module exists: both write/read
    directions must interoperate with the real library byte-for-byte."""
    lmdb = pytest.importorskip("lmdb")
    items = _sample_items(60, big=True)

    # mini writes -> real reads
    mini_path = str(tmp_path / "mini")
    os.makedirs(mini_path)
    write_minilmdb(os.path.join(mini_path, "data.mdb"), items)
    env = lmdb.open(mini_path, readonly=True, lock=False)
    with env.begin() as txn:
        real_view = {bytes(k): bytes(v) for k, v in txn.cursor()}
    env.close()
    assert real_view == items

    # real writes -> mini reads
    real_path = str(tmp_path / "real")
    env = lmdb.open(real_path, map_size=2**24)
    with env.begin(write=True) as txn:
        for k, v in items.items():
            txn.put(k, v)
    env.close()
    assert dict(MiniLMDB(real_path).items()) == items
