#!/bin/bash
# Phase 2 of the round-4 chip schedule: extend the long-horizon run in
# 10k-step segments (orbax resume each time) until the target or the
# wall-clock cutoff, then record a fresh bench line. Run after
# r4_chain.sh completes.
cd /root/repo || exit 1
LOG=/tmp/r4_chain2.log
exec >>"$LOG" 2>&1

TARGET=${TARGET:-150000}
CUTOFF=${CUTOFF:-0}   # unix timestamp; 0 = no cutoff

probe_tpu() {
  timeout 600 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x).sum()) == 128.0 * 128 * 128
print('TPU_OK')" 2>&1 | grep -q TPU_OK
}

wait_tpu() {
  until probe_tpu; do
    echo "[chain2] $(date -u +%H:%M:%S) TPU probe failed; retry in 120s"
    sleep 120
  done
}

echo "[chain2] ===== start $(date -u) target=$TARGET cutoff=$(date -u -d @"$CUTOFF" 2>/dev/null) ====="

while :; do
  now=$(date +%s)
  if [ "$CUTOFF" -gt 0 ] && [ "$now" -gt "$CUTOFF" ]; then
    echo "[chain2] cutoff reached, stopping segments"
    break
  fi
  last=$(python - <<'EOF'
import json
try:
    rows = [json.loads(l) for l in open("results_long_horizon/segments.jsonl")]
    print(rows[-1]["end_step"])
except Exception:
    print(0)
EOF
)
  if [ "$last" -ge "$TARGET" ]; then
    echo "[chain2] reached $last >= $TARGET"
    break
  fi
  wait_tpu
  echo "[chain2] $(date -u +%H:%M:%S) segment from step $last"
  timeout 3600 python scripts/long_horizon.py --workdir results_long_horizon \
    --total_steps "$TARGET" --segment_steps 10000 || {
    echo "[chain2] segment failed rc=$?; backoff 120s"; sleep 120; }
done

wait_tpu
echo "[chain2] $(date -u +%H:%M:%S) running bench.py"
timeout 3600 python bench.py
echo "[chain2] ===== end $(date -u) ====="
