"""Python bindings for the native novelty kernel (ctypes).

API parity with `src/evaluation/novelty/`: `kabsch_alignment`, `rmsd`,
`tm_score`, `gdt_score`, `find_closest_structure`. The heavy scan runs in
C++ (tpu_diffusion/native/novelty.cpp), compiled on first use with g++ and
cached next to the source. A pure-numpy fallback keeps everything working
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native",
                    "novelty.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libnovelty.so")
_LIB: Optional[ctypes.CDLL] = None


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        dptr = ctypes.POINTER(ctypes.c_double)
        lptr = ctypes.POINTER(ctypes.c_int64)
        lib.nov_kabsch_align.argtypes = [dptr, dptr, ctypes.c_int64, dptr]
        lib.nov_rmsd.argtypes = [dptr, dptr, ctypes.c_int64]
        lib.nov_rmsd.restype = ctypes.c_double
        lib.nov_kabsch_rmsd.argtypes = [dptr, dptr, ctypes.c_int64, dptr]
        lib.nov_kabsch_rmsd.restype = ctypes.c_double
        lib.nov_tm_score.argtypes = [dptr, dptr, ctypes.c_int64]
        lib.nov_tm_score.restype = ctypes.c_double
        lib.nov_gdt_score.argtypes = [dptr, dptr, ctypes.c_int64]
        lib.nov_gdt_score.restype = ctypes.c_double
        lib.nov_find_closest.argtypes = [dptr, ctypes.c_int64, dptr, lptr,
                                         ctypes.c_int64, dptr, dptr, lptr]
        _LIB = lib
    return _LIB


def _c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _prep(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, np.float64))


# ---------------------------------------------------------------------------
# numpy fallbacks (and the semantic reference for the C++ kernels)
# ---------------------------------------------------------------------------


def _np_kabsch_alignment(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    cp, cq = p.mean(0), q.mean(0)
    pc, qc = p - cp, q - cq
    c = pc.T @ qc
    v, s, w = np.linalg.svd(c)
    if np.linalg.det(v) * np.linalg.det(w) < 0:
        v[:, -1] = -v[:, -1]
    return pc @ (v @ w) + cq


def kabsch_alignment(p, q) -> np.ndarray:
    p, q = _prep(p), _prep(q)
    lib = _lib()
    if lib is None:
        return _np_kabsch_alignment(p, q)
    out = np.empty_like(p)
    lib.nov_kabsch_align(_c(p), _c(q), len(p), _c(out))
    return out


def rmsd(p, q) -> float:
    p, q = _prep(p), _prep(q)
    lib = _lib()
    if lib is None:
        return float(np.sqrt(np.mean((p - q) ** 2)))
    return float(lib.nov_rmsd(_c(p), _c(q), len(p)))


def tm_score(p, q) -> float:
    p, q = _prep(p), _prep(q)
    lib = _lib()
    if lib is None:
        # Zhang & Skolnick d0, clamped at 0.5 like standard TM-score
        # implementations: the raw formula is <= 0 for L <= 18, which
        # would explode (d/d0)^2 (unguarded in the reference's
        # novelty_calculation.py too).
        d0 = max(1.24 * np.cbrt(len(p) - 15) - 1.8, 0.5)
        d = np.sqrt(np.sum((p - q) ** 2, axis=1))
        return float(np.mean(1.0 / (1.0 + (d / d0) ** 2)))
    return float(lib.nov_tm_score(_c(p), _c(q), len(p)))


def gdt_score(p, q) -> float:
    p, q = _prep(p), _prep(q)
    lib = _lib()
    if lib is None:
        diff = p[:, None, :] - q[None, :, :]
        dist = np.sqrt(np.sum(diff**2, axis=-1))
        return float(np.mean([(dist < t).max(axis=1).mean()
                              for t in (1.0, 2.0, 4.0, 8.0)]))
    return float(lib.nov_gdt_score(_c(p), _c(q), len(p)))


def find_closest_structure(p1, samples: Dict[str, np.ndarray]) -> Dict:
    """Closest training structure under RMSD / TM / GDT with the reference's
    sliding-window rule for unequal lengths (novelty_calculation.py:43-120)."""
    p1 = _prep(p1)
    keys = list(samples.keys())
    arrays = [_prep(samples[k]) for k in keys]
    lib = _lib()
    if lib is None:
        return _np_find_closest(p1, keys, arrays)

    offsets = np.zeros(len(arrays) + 1, np.int64)
    offsets[1:] = np.cumsum([len(a) for a in arrays])
    flat = (np.concatenate(arrays) if arrays
            else np.zeros((0, 3), np.float64))
    flat = np.ascontiguousarray(flat)
    scratch = np.empty_like(p1)
    metrics = np.empty(3, np.float64)
    match = np.empty(3, np.int64)
    lib.nov_find_closest(
        _c(p1), len(p1), _c(flat),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(arrays), _c(scratch), _c(metrics),
        match.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

    def decode(code: int) -> Optional[str]:
        if code < 0:
            return None
        idx, wdw = divmod(int(code), 100000)
        key = keys[idx]
        if len(arrays[idx]) == len(p1):
            return key
        sep = "_" if len(p1) < len(arrays[idx]) else "^"
        return f"{key}{sep}{wdw}"

    return {
        "rmsd_match": decode(match[0]),
        "tm_score_match": decode(match[1]),
        "gdt_score_match": decode(match[2]),
        "rmsd": float(metrics[0]),
        "tm_score": float(metrics[1]),
        "gdt_score": float(metrics[2]),
    }


def _np_find_closest(p1, keys, arrays) -> Dict:
    out = {"rmsd": np.inf, "tm_score": -np.inf, "gdt_score": -np.inf,
           "rmsd_match": None, "tm_score_match": None,
           "gdt_score_match": None}
    for key, sample in zip(keys, arrays):
        n1, ns = len(p1), len(sample)
        windows = 1 if n1 == ns else abs(ns - n1)
        for w in range(windows):
            pw = p1 if n1 <= ns else p1[w:w + ns]
            qw = sample if ns <= n1 else sample[w:w + n1]
            aligned = _np_kabsch_alignment(pw, qw)
            tag = key if n1 == ns else (
                f"{key}_{w}" if n1 < ns else f"{key}^{w}")
            r = float(np.sqrt(np.mean((aligned - qw) ** 2)))
            if r < out["rmsd"]:
                out["rmsd"], out["rmsd_match"] = r, tag
            tm = tm_score(aligned, qw)
            if tm > out["tm_score"]:
                out["tm_score"], out["tm_score_match"] = tm, tag
            g = gdt_score(aligned, qw)
            if g > out["gdt_score"]:
                out["gdt_score"], out["gdt_score_match"] = g, tag
    return out
