#!/bin/bash
# Wait for motif_acceptance (chain3 step 4) to produce its scaffolds, then
# run the CPU-side inverse-folding pass over them. Runs niced: the chain's
# host loop owns the core.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
exec >>/tmp/motif_mpnn.log 2>&1
echo "[watch_motif_mpnn] start $(date -u)"
until [ -e results_motif_acceptance/motif_rmsd.json ]; do sleep 120; done
echo "[watch_motif_mpnn] motif_rmsd.json exists; scoring $(date -u)"
nice -n 10 timeout 14000 python scripts/motif_mpnn_scores.py \
  --sample_dir results_motif_acceptance/samples \
  --output_dir results_motif_acceptance
echo "[watch_motif_mpnn] done rc=$? $(date -u)"
