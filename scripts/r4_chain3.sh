#!/bin/bash
# Round-4 chip schedule, take 2: the environment re-materializes from the
# git snapshot between sessions, so the orbax checkpoints behind the
# pending evidence runs (50k FID, motif acceptance) were wiped. This
# chain retrains both models and then runs every pending on-chip step,
# sequentially (one TPU session at a time), surviving tunnel outages.
#
#   1. CIFAR-10 CFM long-horizon retrain to 50k (10k orbax segments)
#   2. export + reference-scale FID protocol (50k images, batch 1024)
#   3. protein GVP retrain to 24k (resumable snapshots — protein_quality
#      now restores the full TrainState from <out>/resume)
#   4. motif-scaffolding acceptance vs the 24k checkpoint
#   5. encoder-reuse K-sweep FID gate
#   6. (until CUTOFF) long-horizon extension toward 150k, final FID, bench
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_chain3.log
exec >>"$LOG" 2>&1

CUTOFF=${CUTOFF:-0} # unix ts; extensions stop here (core steps always run)

probe_tpu() {
  timeout 600 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x).sum()) == 128.0 * 128 * 128
print('TPU_OK')" 2>&1 | grep -q TPU_OK
}

wait_tpu() {
  local n=0
  until probe_tpu; do
    n=$((n + 1))
    echo "[chain3] $(date -u +%H:%M:%S) TPU probe $n failed; retry in 120s"
    sleep 120
  done
}

run_step() { # name, result_file, timeout_s, cmd...
  local name=$1 result=$2 tmo=$3
  shift 3
  if [ -e "$result" ]; then
    echo "[chain3] $name: result exists ($result), skipping"
    return 0
  fi
  for attempt in 1 2 3; do
    wait_tpu
    echo "[chain3] $(date -u +%H:%M:%S) $name attempt $attempt: $*"
    timeout "$tmo" "$@"
    rc=$?
    if [ $rc -eq 0 ] && [ -e "$result" ]; then
      echo "[chain3] $name DONE (attempt $attempt)"
      return 0
    fi
    echo "[chain3] $name attempt $attempt failed rc=$rc; backoff 120s"
    sleep 120
  done
  echo "[chain3] $name FAILED after 3 attempts"
  return 1
}

echo "[chain3] ===== start $(date -u) cutoff=$(date -u -d @"$CUTOFF" 2>/dev/null) ====="

# --- 1. CIFAR long-horizon retrain to 50k ------------------------------
# long_horizon resumes from <workdir>/ckpt (not segments.jsonl), so it
# restarts at 0 and appends fresh segment rows — run until it reports done.
for i in 1 2 3 4 5 6 7 8 9 10; do
  wait_tpu
  echo "[chain3] $(date -u +%H:%M:%S) long_horizon segment invocation $i"
  out=$(timeout 4000 python scripts/long_horizon.py \
    --workdir results_long_horizon --total_steps 50000 \
    --segment_steps 10000 2>&1 | tail -3)
  echo "$out"
  if echo "$out" | grep -q "done:"; then break; fi
done

# --- 2. export + 50k FID protocol --------------------------------------
# (export is CPU-only and idempotent — always rerun so a half-written
# checkpoint dir can't satisfy a stale existence check)
timeout 1200 python scripts/export_for_fid.py --src results_long_horizon \
  --dst results_fid50k --model otcfm || echo "[chain3] export failed"

run_step fid50k results_fid50k/fid50k.json 14000 \
  python scripts/fid50k.py --input_dir results_fid50k

# --- 3. protein retrain to 24k (resumable) -----------------------------
protein_done() {
  python - <<'EOF'
import json
try:
    q = json.load(open("results_protein_24k_r4/quality_curve.json"))
    done = (not q["partial"]) and max(r["step"] for r in q["curve"]) >= 24000
    print("DONE" if done else "PARTIAL")
except Exception:
    print("NONE")
EOF
}
for i in 1 2 3 4 5 6; do
  [ "$(protein_done)" = DONE ] && break
  wait_tpu
  echo "[chain3] $(date -u +%H:%M:%S) protein_quality invocation $i"
  timeout 9000 python scripts/protein_quality.py \
    --snapshot_steps 6000,12000,18000,24000 --batch_size 16 \
    --out results_protein_24k_r4 || {
    echo "[chain3] protein invocation $i failed rc=$?; backoff 120s"
    sleep 120
  }
done

# --- 4. motif acceptance ------------------------------------------------
run_step motif results_motif_acceptance/motif_rmsd.json 10000 \
  python scripts/motif_acceptance.py \
  --ckpt_dir results_protein_24k_r4/ckpt \
  --output_dir results_motif_acceptance

# --- 5. encoder-reuse FID gate ------------------------------------------
run_step reuse_gate results_reuse_gate/reuse_gate.json 14000 \
  python scripts/reuse_gate.py --workdir results_reuse_gate

# --- 6. extension toward 150k until CUTOFF, final FID, bench ------------
while :; do
  now=$(date +%s)
  if [ "$CUTOFF" -gt 0 ] && [ "$now" -gt "$CUTOFF" ]; then
    echo "[chain3] cutoff reached, stopping extension segments"
    break
  fi
  wait_tpu
  out=$(timeout 4000 python scripts/long_horizon.py \
    --workdir results_long_horizon --total_steps 150000 \
    --segment_steps 10000 2>&1 | tail -3)
  echo "$out"
  if echo "$out" | grep -q "done:"; then break; fi
done

deepest=$(python - <<'EOF'
from tpu_diffusion.train.checkpoint import CheckpointManager
import jax
jax.config.update("jax_platforms", "cpu")
m = CheckpointManager("results_long_horizon/ckpt")
print(m.latest_step() or 0)
EOF
)
if [ "$deepest" -gt 50000 ] && [ ! -e results_fid_final/fid50k.json ]; then
  timeout 1200 python scripts/export_for_fid.py --src results_long_horizon \
    --dst results_fid_final --model otcfm || echo "[chain3] final export failed"
  cp results_fid50k/real_stats_*.npz results_fid_final/otcfm/ 2>/dev/null
  cp results_fid50k/real_stats_*.npz results_fid_final/ 2>/dev/null
  run_step fid_final results_fid_final/fid50k.json 10000 \
    python scripts/fid50k.py --input_dir results_fid_final --methods euler
fi

wait_tpu
echo "[chain3] $(date -u +%H:%M:%S) running bench.py"
timeout 3600 python bench.py
echo "[chain3] ===== end $(date -u) ====="
