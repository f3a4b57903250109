#!/bin/bash
# Round-5 chip schedule, phase 1: the orbax checkpoints were wiped again
# at the session boundary (environment re-materializes from the git
# snapshot), so the queued dopri5 50k-FID leg (VERDICT r4 item 2) needs
# its checkpoint retrained first.
#
#   1. CIFAR-10 CFM long-horizon retrain to 50k (10k orbax segments,
#      device pipeline, ~55 min)
#   2. export + the dopri5 leg of the reference 50k-image FID protocol
#      (euler leg persisted from r4 and skipped; Dopri5Chunked 16-trip
#      segments — the fix for the r4 worker crashes)
#
# Later phases (conditioning sweep, outpainting/flowers, 256px, SF2M,
# bench after layout work) are driven interactively as the code lands.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_tpu_diffusion}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=/tmp/r5_chain.log
exec >>"$LOG" 2>&1

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
    echo "[chain5.1] $(date -u +%H:%M:%S) TPU probe $n failed; retry in 120s"
    sleep 120
  done
}

echo "[chain5.1] ===== start $(date -u) ====="

# --- 1. CIFAR long-horizon retrain to 50k ------------------------------
for i in 1 2 3 4 5 6 7 8 9 10; do
  wait_tpu
  echo "[chain5.1] $(date -u +%H:%M:%S) long_horizon segment invocation $i"
  out=$(timeout 4000 python scripts/long_horizon.py \
    --workdir results_long_horizon --total_steps 50000 \
    --segment_steps 10000 2>&1 | tail -3)
  echo "$out"
  if echo "$out" | grep -q "done:"; then break; fi
done

# --- 2. export + dopri5 50k FID leg -------------------------------------
timeout 1200 python scripts/export_for_fid.py --src results_long_horizon \
  --dst results_fid50k --model otcfm || echo "[chain5.1] export failed"

# fid50k_euler.json persists from r4 (same deterministic 50k recipe) and
# is reused; only the dopri5 leg runs. 49 batches x 552 NFE + one-time
# real-stats pass => bound generously.
for attempt in 1 2 3; do
  wait_tpu
  echo "[chain5.1] $(date -u +%H:%M:%S) fid50k dopri5 attempt $attempt"
  timeout 14000 python scripts/fid50k.py --input_dir results_fid50k
  rc=$?
  if [ $rc -eq 0 ] && [ -e results_fid50k/fid50k_dopri5.json ]; then
    echo "[chain5.1] dopri5 leg DONE"
    break
  fi
  echo "[chain5.1] dopri5 attempt $attempt failed rc=$rc; backoff 120s"
  sleep 120
done

echo "[chain5.1] ===== end $(date -u) ====="
