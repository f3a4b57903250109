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

# FID protocol against the deepest checkpoint reached (euler only —
# the dual-integrator artifact already exists at step 50k)
last=$(python - <<'EOF'
import json
try:
    rows = [json.loads(l) for l in open("results_long_horizon/segments.jsonl")]
    print(rows[-1]["end_step"])
except Exception:
    print(0)
EOF
)
if [ "$last" -gt 50000 ] && [ ! -e "results_fid_final/fid50k.json" ]; then
  wait_tpu
  echo "[chain2] $(date -u +%H:%M:%S) fid protocol at step $last"
  timeout 600 python scripts/export_for_fid.py --src results_long_horizon \
    --dst results_fid_final --model otcfm &&
  cp results_fid50k/real_stats_*.npz results_fid_final/ 2>/dev/null
  timeout 7200 python scripts/fid50k.py --input_dir results_fid_final \
    --methods euler || echo "[chain2] fid at $last failed"
fi

wait_tpu
echo "[chain2] $(date -u +%H:%M:%S) running bench.py"
timeout 3600 python bench.py
echo "[chain2] ===== end $(date -u) ====="
