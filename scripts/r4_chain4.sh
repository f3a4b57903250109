#!/bin/bash
# Round-4 chip schedule, follow-up: the dopri5 leg of the 50k FID protocol.
#
# The first 50k run completed euler (fid50k_euler.json) but dopri5 died
# reproducibly: its calibrated 92-trip budget is 552 UNet evaluations in
# ONE device executable (~165 s at batch 1024) and the axon tunnel kills
# minutes-long executions ("TPU worker process crashed", /tmp/r4_chain3.log).
# compute_fid now drives dopri5 through Dopri5Chunked — the same masked
# scan split into 16-trip (96-NFE) executions, bitwise-identical numerics
# (tests/test_ode.py) at the proven euler-100 execution scale.
#
# This chain waits for r4_chain3.sh to release the chip (one TPU session
# at a time), then reruns scripts/fid50k.py: euler is reused from its
# persisted result, dopri5 runs fresh, fid50k.json is rewritten with both.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_chain4.log
exec >>"$LOG" 2>&1
echo "[chain4] ===== start $(date -u) ====="

# wait for chain3 (holds the TPU) to exit
if [ -f /tmp/chain3.pid ]; then
  while kill -0 "$(cat /tmp/chain3.pid)" 2>/dev/null; do
    sleep 60
  done
fi
echo "[chain4] $(date -u +%H:%M:%S) chain3 exited; taking the chip"

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
    echo "[chain4] $(date -u +%H:%M:%S) TPU probe $n failed; retry in 120s"
    sleep 120
  done
}

for attempt in 1 2 3; do
  wait_tpu
  echo "[chain4] $(date -u +%H:%M:%S) fid50k dopri5 attempt $attempt"
  timeout 14000 python scripts/fid50k.py --input_dir results_fid50k
  rc=$?
  if [ $rc -eq 0 ] && [ -e results_fid50k/fid50k_dopri5.json ]; then
    echo "[chain4] fid50k dopri5 DONE (attempt $attempt)"
    break
  fi
  echo "[chain4] attempt $attempt failed rc=$rc; backoff 120s"
  sleep 120
done

# dopri5 leg against the deepest (150k) checkpoint too, if chain3 built it
if [ -e results_fid_final/otcfm/ckpt ] || [ -d results_fid_final/otcfm/ckpt ]; then
  cp results_fid50k/real_stats_*.npz results_fid_final/ 2>/dev/null
  for attempt in 1 2 3; do
    wait_tpu
    echo "[chain4] $(date -u +%H:%M:%S) fid_final dopri5 attempt $attempt"
    timeout 14000 python scripts/fid50k.py --input_dir results_fid_final \
      --methods dopri5
    rc=$?
    if [ $rc -eq 0 ] && [ -e results_fid_final/fid50k_dopri5.json ]; then
      echo "[chain4] fid_final dopri5 DONE (attempt $attempt)"
      break
    fi
    echo "[chain4] attempt $attempt failed rc=$rc; backoff 120s"
    sleep 120
  done
  # merge both methods into the final summary (euler row persisted by chain3)
  wait_tpu
  timeout 14000 python scripts/fid50k.py --input_dir results_fid_final || true
fi

echo "[chain4] ===== end $(date -u) ====="
