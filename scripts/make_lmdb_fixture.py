"""Generate the checked-in LMDB fixture (tests/fixtures/lmdb/data.mdb).

Deterministic tiny protein-like payloads, pickled, written with the
pure-Python writer (or the real lmdb module when installed, for a
library-authored fixture). Re-run only when the fixture must change.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tpu_diffusion.data.storage import LMDBDataset


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "lmdb")
    payload = {}
    for i, length in enumerate((16, 24, 40)):
        rng = np.random.default_rng(100 + i)
        coords = np.round(rng.normal(0, 5, (length, 3)), 3)
        payload[f"protein_{i:03d}"] = {
            "coords": coords, "length": length,
            "checksum": float(coords.sum())}
    LMDBDataset.write(out, payload, serializer="pkl")
    print("wrote", out, os.listdir(out))


if __name__ == "__main__":
    main()
