"""Inverse-folding (ProteinMPNN) scores for motif-scaffolding samples.

Completes the reference's motif-eval surface over the scaffolds that
`scripts/motif_acceptance.py` generates: per sample, design a sequence
with the motif residues FIXED, then re-score it under `n_seq` seeds
(reference `run_proteinmpnn_eval(dir, motif_inds=..., motif_res=...)`,
evaluation_pipeline.py:484-513) and write the `protein_mpnn_seqs.csv`
ColabFold input (:515-527).

Runs on the host CPU on purpose — the TPU stays free for the evidence
chain — with the CA-ProteinMPNN from `protein/mpnn.py`. Without a
converted public checkpoint ($TPU_DIFFUSION_MPNN_WEIGHTS) the scorer is
the real architecture at RANDOM INIT: scores are deterministic,
structure-dependent, and self-consistent across this repo's runs, but NOT
comparable to scores from the published weights — the caveat is embedded
in the output JSON, like the random-feature FID.

The synthetic motif has no native sequence (it is a geometry fragment,
cli/sample_protein.load_motif), so the fixed motif identities are drawn
deterministically from --seed and recorded in the output.

Usage (after motif_acceptance has produced samples):
  python scripts/motif_mpnn_scores.py --sample_dir results_motif_acceptance/samples \
      --output_dir results_motif_acceptance
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sample_dir", default="results_motif_acceptance/samples")
    p.add_argument("--output_dir", default="results_motif_acceptance")
    p.add_argument("--n_seq", type=int, default=3)
    p.add_argument("--max_samples", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--k", type=int, default=48)
    p.add_argument("--temperature", type=float, default=0.1)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpu_diffusion.cli.sample_protein import load_motif
    from tpu_diffusion.protein.data import COORD_SCALE
    from tpu_diffusion.protein.mpnn import load_mpnn_scorer
    from tpu_diffusion.protein.self_consistency import (ALPHABET,
                                                        proteinmpnn_scores,
                                                        write_seqs_csv)

    weights = os.environ.get("TPU_DIFFUSION_MPNN_WEIGHTS")
    scorer = load_mpnn_scorer(npz_path=weights, hidden=args.hidden,
                              k=args.k, seed=args.seed,
                              temperature=args.temperature)

    # the motif exactly as the sampler placed it (same defaults)
    _, motif_idx = load_motif(None, None, 112, args.seed)
    motif_idx = np.asarray(motif_idx)
    del COORD_SCALE  # motif geometry not needed here, only indices
    rng = np.random.default_rng(args.seed)
    motif_res = "".join(ALPHABET[i] for i in
                        rng.integers(0, 20, len(motif_idx)))

    paths = sorted(glob.glob(os.path.join(args.sample_dir,
                                          "sample_*.npy")))[:args.max_samples]
    if not paths:
        print(f"[motif_mpnn] no samples under {args.sample_dir}")
        sys.exit(1)

    rows, all_seqs = [], []
    t0 = time.monotonic()
    for n, path in enumerate(paths):
        coords = np.load(path).astype(np.float32)     # [L, 3] Angstrom
        valid = motif_idx < len(coords)
        inds = motif_idx[valid].tolist()
        res = "".join(c for c, v in zip(motif_res, valid) if v)
        scores, seqs = proteinmpnn_scores(coords, scorer, n_seq=args.n_seq,
                                          motif_inds=inds, motif_res=res)
        rows.append({"sample": os.path.basename(path),
                     "length": int(len(coords)),
                     "scores": np.round(scores, 6).tolist(),
                     "seq": seqs[0]})
        all_seqs.append(seqs)
        if n % 10 == 0:
            rate = (n + 1) / (time.monotonic() - t0)
            print(f"[motif_mpnn] {n + 1}/{len(paths)} "
                  f"({rate:.2f} samples/s)", flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    write_seqs_csv(all_seqs, os.path.join(args.output_dir,
                                          "protein_mpnn_seqs.csv"))
    mean_scores = np.asarray([r["scores"] for r in rows])
    out = {
        "n": len(rows),
        "n_seq": args.n_seq,
        "motif_inds": motif_idx.tolist(),
        "motif_res": motif_res,
        "score_mean": float(mean_scores.mean()),
        "score_std": float(mean_scores.std()),
        "weights": weights or "random_init",
        "comparable_to_published": bool(weights),
        "note": ("random-init CA-ProteinMPNN (no pretrained weights in "
                 "this environment): scores are deterministic and "
                 "self-consistent across this framework's runs, NOT "
                 "comparable to published ProteinMPNN scores; import real "
                 "weights via protein/mpnn.py:convert_mpnn_state_dict")
        if not weights else "converted public weights",
        "per_sample": rows,
    }
    out_path = os.path.join(args.output_dir, "mpnn_scores.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[motif_mpnn] wrote {out_path}: mean exp(-NLL) "
          f"{out['score_mean']:.4f} over {out['n']} scaffolds", flush=True)


if __name__ == "__main__":
    main()
