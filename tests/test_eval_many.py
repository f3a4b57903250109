"""eval_many backend tests: process pool (reference joblib-process parity,
evaluation_pipeline.py:104-130), thread pool, and auto selection."""

import numpy as np

import pytest

from tpu_diffusion.protein.evaluate import (DEFAULT_STAGES,
                                            EvaluationPipeline,
                                            make_novelty_stage)

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _chains(n, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for i in range(n):
        steps = rng.normal(0, 1, (40 + 4 * i, 3))
        steps = 3.8 * steps / np.linalg.norm(steps, axis=-1, keepdims=True)
        out[f"s{i}"] = np.cumsum(steps, 0)
    return out


def test_thread_backend_matches_serial():
    structures = _chains(4)
    pipeline = EvaluationPipeline()
    serial = pipeline.eval_many(structures, n_jobs=1)
    threaded = pipeline.eval_many(structures, n_jobs=2, backend="thread")
    assert threaded == serial


def test_process_backend_matches_serial():
    # includes the novelty stage to prove the stage set pickles into
    # spawn workers (closure-free _NoveltyFn)
    structures = _chains(3)
    train = _chains(2, seed=9)
    pipeline = EvaluationPipeline(list(DEFAULT_STAGES)
                                  + [make_novelty_stage(train)])
    serial = pipeline.eval_many(structures, n_jobs=1)
    procs = pipeline.eval_many(structures, n_jobs=2, backend="process")
    assert procs == serial


def test_auto_backend_runs():
    structures = _chains(3)
    rows = EvaluationPipeline().eval_many(structures, n_jobs=2)
    assert len(rows) == 3 and all("ca_distance_mean" in r for r in rows)
