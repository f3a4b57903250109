#!/bin/bash
# Round-4 chip schedule, take 3 (session 3): the long-horizon extension
# yielded the chip at 80k via the STOP file and chain3 finished with the
# 80k-checkpoint euler FID + bench. This chain closes the remaining
# on-chip verdict evidence, in banked-first order:
#   1. encoder-reuse K in {1,2,3,4} FID gate — K=3 crashed the first
#      sweep on the divisibility guard; non-dividing K now runs a
#      prologue group (sampling/ancestral.py) and the sweep itself is
#      resumable across invocations (rows.jsonl)
#   2. the dopri5 leg of the 50k-image FID protocol via Dopri5Chunked
#      (16-trip / 96-NFE device executions at the proven euler-100
#      execution scale; the single 552-NFE executable reproducibly got
#      the TPU worker killed — /tmp/r4_chain3.log)
#   3. (bonus) dopri5 against the deepest (80k) checkpoint if chain3
#      exported it, then the merged summary
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_chain5.log
exec >>"$LOG" 2>&1
echo "[chain5] ===== start $(date -u) ====="

# Hard deadline: the round driver runs bench.py on the chip at round end
# and only one process can hold the TPU session — stop starting work
# (and bound what is running) well before that.
DEADLINE=${CHAIN5_DEADLINE:-1787166000}
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }

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
    echo "[chain5] $(date -u +%H:%M:%S) TPU probe $n failed; retry in 120s"
    sleep 120
  done
}

run_step() { # name, result_file, timeout_s, cmd...
  local name=$1 result=$2 tmo=$3
  shift 3
  if [ -e "$result" ]; then
    echo "[chain5] $name: result exists ($result), skipping"
    return 0
  fi
  for attempt in 1 2 3; do
    if past_deadline; then
      echo "[chain5] $name: past deadline $DEADLINE, yielding the chip"
      return 1
    fi
    # never let a step run into the deadline: shrink its timeout to fit
    local now left
    now=$(date +%s); left=$((DEADLINE - now))
    [ "$left" -lt "$tmo" ] && tmo=$left
    [ "$tmo" -lt 120 ] && { echo "[chain5] $name: <120s left, yielding"; return 1; }
    wait_tpu
    echo "[chain5] $(date -u +%H:%M:%S) $name attempt $attempt: $*"
    timeout "$tmo" "$@"
    rc=$?
    if [ $rc -eq 0 ] && [ -e "$result" ]; then
      echo "[chain5] $name DONE (attempt $attempt)"
      return 0
    fi
    echo "[chain5] $name attempt $attempt failed rc=$rc; backoff 120s"
    sleep 120
  done
  echo "[chain5] $name FAILED after 3 attempts"
  return 1
}

run_step reuse_gate results_reuse_gate/reuse_gate.json 14000 \
  python scripts/reuse_gate.py --workdir results_reuse_gate

# Bench at K in {2,3,4} right after the gate so the default-K decision is
# made from measurements on this very chip (one JSON line per K).
if [ ! -e results_reuse_gate/bench_by_k.jsonl ]; then
  for K in 2 3 4; do
    if past_deadline; then break; fi
    wait_tpu
    echo "[chain5] bench K=$K"
    TPU_DIFFUSION_BENCH_REUSE=$K timeout 1200 python bench.py \
      >> results_reuse_gate/bench_by_k.jsonl
  done
fi

# Measured HBM-traffic attribution from the chip's own optimized HLO —
# closes the architecture accounting's 12% residual (compile-only, fast).
run_step hlo_traffic results_reuse_gate/hlo_traffic.json 1800 \
  python scripts/hlo_traffic.py --out results_reuse_gate/hlo_traffic.json

run_step fid50k_dopri5 results_fid50k/fid50k_dopri5.json 14000 \
  python scripts/fid50k.py --input_dir results_fid50k

if [ -d results_fid_final/otcfm/ckpt ]; then
  cp results_fid50k/real_stats_*.npz results_fid_final/ 2>/dev/null
  run_step fid_final_dopri5 results_fid_final/fid50k_dopri5.json 14000 \
    python scripts/fid50k.py --input_dir results_fid_final --methods dopri5
  # merge euler (persisted by chain3) + dopri5 into the final summary
  wait_tpu
  timeout 1200 python scripts/fid50k.py --input_dir results_fid_final || true
fi

echo "[chain5] ===== end $(date -u) ====="
