"""Protein sample evaluation pipeline.

Rebuilds `amortised diffusion/src/evaluation/evaluation_pipeline.py`: a
staged pipeline over sampled structures producing per-sample statistics
(`sample_stats.csv` equivalent):

  * BackboneSanityCheck   — NaN / stuck-canvas detection (:322-338)
  * BackboneCAEvaluator   — consecutive C-alpha distances (:211-246)
  * BackboneCAAngleEvaluator — bond/dihedral angles (:249-287)
  * RadiusOfGyration      — (:341-359)
  * VolumeEvaluator       — convex hull volume (:370-385)
  * NoveltyEvaluator      — closest train structure RMSD/TM/GDT via the
                            native C++ kernel (novelty/)

The ProteinMPNN + ColabFold self-consistency stages of the reference call
external model servers that do not exist in this environment; the pipeline
exposes the same stage interface so they can be plugged in where available.

Stages are numpy (post-hoc analysis, not a TPU workload); the heavy novelty
scan is C++.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclass
class EvaluationStage:
    """Named stage computing statistics for one [L, 3] structure."""

    name: str
    fn: Callable[[np.ndarray], Dict[str, float]]

    def __call__(self, coords: np.ndarray) -> Dict[str, float]:
        return self.fn(coords)


def sanity_check(coords: np.ndarray) -> Dict[str, float]:
    finite = bool(np.isfinite(coords).all())
    spread = float(np.std(coords)) if finite else 0.0
    return {"finite": float(finite),
            "degenerate": float(finite and spread < 1e-3)}


def ca_distances(coords: np.ndarray) -> Dict[str, float]:
    d = np.linalg.norm(np.diff(coords, axis=0), axis=-1)
    return {"ca_dist_mean": float(d.mean()), "ca_dist_std": float(d.std()),
            "ca_dist_min": float(d.min()), "ca_dist_max": float(d.max()),
            # fraction within 15% of the ideal 3.8 A pseudo-bond
            "ca_dist_valid_frac": float(
                np.mean(np.abs(d - 3.8) < 0.15 * 3.8))}


def ca_angles(coords: np.ndarray) -> Dict[str, float]:
    v1 = coords[1:-1] - coords[:-2]
    v2 = coords[2:] - coords[1:-1]
    cos = np.sum(v1 * v2, -1) / (np.linalg.norm(v1, axis=-1)
                                 * np.linalg.norm(v2, axis=-1) + 1e-9)
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    out = {"ca_angle_mean": float(ang.mean()),
           "ca_angle_std": float(ang.std())}
    if len(coords) >= 4:
        b1, b2, b3 = (coords[1:-2] - coords[:-3], coords[2:-1]
                      - coords[1:-2], coords[3:] - coords[2:-1])
        n1 = np.cross(b1, b2)
        n2 = np.cross(b2, b3)
        m1 = np.cross(n1, b2 / (np.linalg.norm(b2, axis=-1, keepdims=True)
                                + 1e-9))
        x = np.sum(n1 * n2, -1)
        y = np.sum(m1 * n2, -1)
        dih = np.degrees(np.arctan2(y, x))
        out["ca_dihedral_abs_mean"] = float(np.abs(dih).mean())
    return out


def radius_of_gyration(coords: np.ndarray) -> Dict[str, float]:
    centered = coords - coords.mean(0, keepdims=True)
    return {"radius_of_gyration": float(
        np.sqrt(np.mean(np.sum(centered**2, -1))))}


def hull_volume(coords: np.ndarray) -> Dict[str, float]:
    try:
        from scipy.spatial import ConvexHull
        hull = ConvexHull(coords)
        return {"hull_volume": float(hull.volume),
                "hull_area": float(hull.area)}
    except Exception:
        return {"hull_volume": float("nan"), "hull_area": float("nan")}


def make_novelty_stage(train: Dict[str, np.ndarray]) -> EvaluationStage:
    from tpu_diffusion.protein.novelty import find_closest_structure

    def fn(coords: np.ndarray) -> Dict[str, float]:
        out = find_closest_structure(coords, train)
        return {"novelty_rmsd": out["rmsd"],
                "novelty_tm_score": out["tm_score"],
                "novelty_gdt_score": out["gdt_score"]}

    return EvaluationStage("novelty", fn)


DEFAULT_STAGES = [
    EvaluationStage("sanity", sanity_check),
    EvaluationStage("ca_dist", ca_distances),
    EvaluationStage("ca_angle", ca_angles),
    EvaluationStage("rg", radius_of_gyration),
    EvaluationStage("hull", hull_volume),
]


@dataclass
class EvaluationPipeline:
    """eval_single / eval_many / eval_dir (reference :86-175)."""

    stages: Sequence[EvaluationStage] = field(
        default_factory=lambda: list(DEFAULT_STAGES))

    def eval_single(self, coords: np.ndarray,
                    sample_id: str = "") -> Dict[str, float]:
        row: Dict[str, float] = {"id": sample_id,
                                 "length": int(len(coords))}
        for stage in self.stages:
            try:
                row.update(stage(coords))
            except Exception as e:  # a failing stage must not kill the run
                row[f"{stage.name}_error"] = str(e)
        return row

    def eval_many(self, structures: Dict[str, np.ndarray]) -> List[Dict]:
        return [self.eval_single(c, sid) for sid, c in structures.items()]

    def eval_dir(self, sample_dir: str, out_csv: Optional[str] = None
                 ) -> List[Dict]:
        structures = {}
        for f in sorted(os.listdir(sample_dir)):
            if f.endswith(".npy") and f.startswith("sample"):
                structures[f[:-4]] = np.load(os.path.join(sample_dir, f))
        rows = self.eval_many(structures)
        if out_csv is None:
            out_csv = os.path.join(sample_dir, "sample_stats.csv")
        _write_csv(rows, out_csv)
        return rows


def _write_csv(rows: List[Dict], path: str):
    import csv
    if not rows:
        return
    cols: List[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols, restval="")
        w.writeheader()
        w.writerows(rows)


def summarize(rows: List[Dict]) -> Dict[str, float]:
    """Mean of every numeric column (the plot pipeline's input)."""
    out = {}
    if not rows:
        return out
    for k in rows[0]:
        vals = [r[k] for r in rows if isinstance(r.get(k), (int, float))
                and np.isfinite(r[k])]
        if vals:
            out[f"{k}_mean"] = float(np.mean(vals))
    return out


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--sample_dir", required=True)
    p.add_argument("--train_root", default="data/scope",
                   help="training set for the novelty stage")
    p.add_argument("--novelty", action="store_true")
    p.add_argument("--max_train", type=int, default=200)
    args = p.parse_args(argv)

    stages = list(DEFAULT_STAGES)
    if args.novelty:
        from tpu_diffusion.protein.data import get_protein_data
        ds = get_protein_data(args.train_root)
        train = {f"train_{i}":
                 ds.positions[i][:ds.lengths[i]] / (1.0 / 15.0)
                 for i in range(min(len(ds), args.max_train))}
        stages.append(make_novelty_stage(train))

    rows = EvaluationPipeline(stages).eval_dir(args.sample_dir)
    summary = summarize(rows)
    with open(os.path.join(args.sample_dir, "summary_stats.json"),
              "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
