"""Storage datasets, graph transforms, F1Max."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.data.storage import (DataFrameDataset, DictDataset,
                                        FileDataset, KeepFields, LMDBDataset,
                                        TarDataset, ZipDataset,
                                        get_serializer)
from tpu_diffusion.eval.f1max import F1Max, f1_max
from tpu_diffusion.protein.transforms import (OrientationFrames, full_graph,
                                              ideal_backbone_from_ca,
                                              knn_graph, one_hot_encode,
                                              positions_to_graph,
                                              radius_graph)


def test_serializers_roundtrip():
    obj = {"a": 1, "b": [1.5, 2.5]}
    for name in ["pkl", "dill", "msgpack"]:
        s = get_serializer(name)
        assert s.loads(s.dumps(obj)) == obj
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    s = get_serializer("npy")
    np.testing.assert_array_equal(s.loads(s.dumps(arr)), arr)


def test_file_dataset_roundtrip(tmp_path):
    items = {"a": np.ones((2, 3)), "b": np.zeros((4,))}
    FileDataset.write(str(tmp_path / "fs"), items)
    ds = FileDataset(str(tmp_path / "fs"))
    assert len(ds) == 2
    np.testing.assert_array_equal(ds["a"], items["a"])
    np.testing.assert_array_equal(ds[1], items["b"])  # sorted keys


def test_tar_zip_datasets(tmp_path):
    import tarfile
    import zipfile
    s = get_serializer("npy")
    data = {"x.npy": np.arange(5.0), "y.npy": np.eye(2)}
    tar_path = str(tmp_path / "d.tar")
    with tarfile.open(tar_path, "w") as tf:
        for k, v in data.items():
            raw = s.dumps(v)
            import io
            info = tarfile.TarInfo(k)
            info.size = len(raw)
            tf.addfile(info, io.BytesIO(raw))
    ds = TarDataset(tar_path)
    np.testing.assert_array_equal(ds["x.npy"], data["x.npy"])

    zip_path = str(tmp_path / "d.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for k, v in data.items():
            zf.writestr(k, s.dumps(v))
    ds = ZipDataset(zip_path)
    np.testing.assert_array_equal(ds["y.npy"], data["y.npy"])


def test_memory_datasets_and_keepfields():
    ds = DictDataset({"k1": {"a": 1, "b": 2}},
                     transform=KeepFields(["a"]))
    assert ds["k1"] == {"a": 1}

    import pandas as pd
    df = pd.DataFrame({"id": [10, 20], "v": [0.5, 1.5]})
    ds = DataFrameDataset(df, index_col="id")
    assert ds["10"]["v"] == 0.5


def test_lmdb_missing_file_raises():
    # with the pure-Python fallback the gate is now on the file, not the
    # module (see tests/test_lmdb.py for the format round-trip)
    with pytest.raises(Exception):
        LMDBDataset("/tmp/nonexistent_lmdb")


def test_graph_builders():
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 3)))
    mask = jnp.ones((2, 10), bool).at[1, 7:].set(False)
    fg = full_graph(mask)
    assert not bool(fg[0, 3, 3])  # no self loops
    assert int(fg[1].sum()) == 7 * 6

    rg = radius_graph(pos, mask, radius=1.0)
    assert bool(jnp.all(~rg | fg))  # subset of full graph

    kg = knn_graph(pos, mask, k=3)
    counts = np.asarray(kg.sum(-1))
    assert counts[0].max() <= 3 + 1  # ties can add one
    # masked nodes have no neighbors
    assert counts[1][7:].max() == 0


def test_one_hot_and_positions_to_graph():
    oh = one_hot_encode(jnp.array([0, 2]), 3)
    np.testing.assert_array_equal(np.asarray(oh), [[1, 0, 0], [0, 0, 1]])
    coords = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)) * 15)
    g = positions_to_graph(coords)
    np.testing.assert_allclose(np.asarray(g.mean(0)), 0.0, atol=1e-6)


def test_orientation_frames_orthonormal():
    rng = np.random.default_rng(2)
    ca = jnp.asarray(rng.normal(size=(6, 3)) * 3)
    n_pos, c_pos = ideal_backbone_from_ca(ca)
    frames = OrientationFrames.from_backbone(n_pos, ca, c_pos)
    rot = np.asarray(frames.rotations)
    for r in rot:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    # apply/invert roundtrip
    local = jnp.asarray(rng.normal(size=(6, 3)))
    rec = frames.invert_apply(frames.apply(local))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(local),
                               atol=1e-5)


def test_f1max_perfect_and_random():
    targets = np.zeros((8, 5), np.float32)
    targets[np.arange(8), np.arange(8) % 5] = 1
    assert float(f1_max(targets, targets)) == pytest.approx(1.0, abs=1e-3)
    rng = np.random.default_rng(3)
    noise = rng.uniform(size=(8, 5)).astype(np.float32)
    assert float(f1_max(noise, targets)) < 0.9

    m = F1Max()
    m.update(targets[:4], targets[:4])
    m.update(targets[4:], targets[4:])
    assert m.compute() == pytest.approx(1.0, abs=1e-3)
