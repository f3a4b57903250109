"""Measure eval_many scaling: serial vs thread pool vs process pool.

VERDICT r2 item 8: the reference parallelizes its evaluation pipeline with
joblib *processes* (evaluation_pipeline.py:104-130) because the numpy
angle/SSE stages hold the GIL; `eval_many` now defaults to a (spawn)
ProcessPoolExecutor. This script times all three backends on a synthetic
100-structure set and prints one JSON line; run on a multi-core eval host
to see the scaling (this repo's dev host is 1-core — expect ~1x there, and
a small process-spawn overhead).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tpu_diffusion.protein.evaluate import EvaluationPipeline


def main():
    rng = np.random.default_rng(0)
    structures = {}
    for i in range(100):
        n = int(rng.integers(60, 120))
        walk = rng.normal(0, 1, (n, 3))
        walk = np.cumsum(3.8 * walk / np.linalg.norm(walk, axis=-1,
                                                     keepdims=True), 0)
        structures[f"s{i:03d}"] = walk

    pipeline = EvaluationPipeline()
    results = {"n_structures": len(structures),
               "cpu_count": os.cpu_count()}

    t0 = time.perf_counter()
    serial = pipeline.eval_many(structures, n_jobs=1)
    results["serial_s"] = round(time.perf_counter() - t0, 3)

    for backend in ("thread", "process"):
        t0 = time.perf_counter()
        rows = pipeline.eval_many(structures, n_jobs=4, backend=backend)
        results[f"{backend}_njobs4_s"] = round(time.perf_counter() - t0, 3)
        assert len(rows) == len(serial)
        # parallel result must equal serial (order and values)
        for a, b in zip(rows, serial):
            assert a == b, (a, b)
    results["thread_speedup"] = round(
        results["serial_s"] / results["thread_njobs4_s"], 2)
    results["process_speedup"] = round(
        results["serial_s"] / results["process_njobs4_s"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
