#!/bin/bash
# Round-4 on-chip evidence chain (verdict items 2, 3, 1c).
# Survives TPU-tunnel outages: probes until the chip answers, runs each
# step with a bounded timeout, retries failed steps, skips steps whose
# result file already exists. Sequential by construction — only one
# process may hold the TPU session.
cd /root/repo || exit 1
LOG=/tmp/r4_chain.log
exec >>"$LOG" 2>&1

probe_tpu() {
  timeout 600 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x).sum()) == 128.0 * 128 * 128
print('TPU_OK', jax.devices())" 2>&1 | grep -q TPU_OK
}

wait_tpu() {
  local n=0
  until probe_tpu; do
    n=$((n + 1))
    echo "[chain] $(date -u +%H:%M:%S) TPU probe $n failed; retry in 120s"
    sleep 120
  done
  echo "[chain] $(date -u +%H:%M:%S) TPU up"
}

run_step() { # name, result_file, timeout_s, cmd...
  local name=$1 result=$2 tmo=$3
  shift 3
  if [ -e "$result" ]; then
    echo "[chain] $name: result exists ($result), skipping"
    return 0
  fi
  for attempt in 1 2 3; do
    wait_tpu
    echo "[chain] $(date -u +%H:%M:%S) $name attempt $attempt: $*"
    timeout "$tmo" "$@"
    rc=$?
    if [ $rc -eq 0 ] && [ -e "$result" ]; then
      echo "[chain] $name DONE (attempt $attempt)"
      return 0
    fi
    echo "[chain] $name attempt $attempt failed rc=$rc; backoff 120s"
    sleep 120
  done
  echo "[chain] $name FAILED after 3 attempts"
  return 1
}

echo "[chain] ===== start $(date -u) ====="

run_step fid50k results_fid50k/fid50k.json 14000 \
  python scripts/fid50k.py --input_dir results_fid50k

run_step motif results_motif_acceptance/motif_rmsd.json 10000 \
  python scripts/motif_acceptance.py \
  --ckpt_dir results_protein_quality_24k/ckpt \
  --output_dir results_motif_acceptance

run_step reuse_gate /tmp/reuse_gate/reuse_gate.json 14000 \
  python scripts/reuse_gate.py --workdir /tmp/reuse_gate

echo "[chain] ===== end $(date -u) ====="
