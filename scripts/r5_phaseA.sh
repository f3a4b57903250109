#!/bin/bash
# Round-5 phase A: ONLY steps 0 + 0.5 of r5_chain2.sh (HLO dump +
# attention-impl A/B bench + fused-program traffic attribution), pulled
# forward ahead of the chain-1 retrain so the layout-copy analysis — the
# round's top verdict item — has its on-chip decision data while the long
# evidence runs hold the chip. Result-file guards match r5_chain2.sh, so
# chain2 later skips these steps.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_tpu_diffusion}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=/tmp/r5_phaseA.log
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
    echo "[phaseA] $(date -u +%H:%M:%S) TPU probe $n failed; retry in 120s"
    sleep 120
  done
}

echo "[phaseA] ===== start $(date -u) ====="
mkdir -p results_perf

# --- 0. HLO dump for offline layout analysis ----------------------------
if [ ! -e results_perf/hlo_tpu_r5.txt.gz ]; then
  wait_tpu
  timeout 2400 python scripts/hlo_traffic.py \
    --save_hlo results_perf/hlo_tpu_r5.txt.gz \
    --detail_category layout_copy --top 24 \
    --out results_perf/hlo_traffic_r5.json
fi

# --- 0.5 attention-impl A/B on the bench workload ------------------------
if [ ! -e results_perf/bench_ab.json ]; then
  wait_tpu
  echo "[phaseA] $(date -u +%H:%M:%S) bench A/B: xla"
  XLA_OUT=$(timeout 3600 env TPU_DIFFUSION_BENCH_ATTN=xla python bench.py | tail -1)
  echo "$XLA_OUT"
  wait_tpu
  echo "[phaseA] $(date -u +%H:%M:%S) bench A/B: pallas_fused"
  FUSED_OUT=$(timeout 3600 env TPU_DIFFUSION_BENCH_ATTN=pallas_fused python bench.py | tail -1)
  echo "$FUSED_OUT"
  python - "$XLA_OUT" "$FUSED_OUT" <<'EOF'
import json, sys
rows = []
for s in sys.argv[1:3]:
    try:
        rows.append(json.loads(s))
    except Exception:
        rows.append({"error": s[:400]})
with open("results_perf/bench_ab.json", "w") as f:
    json.dump({"runs": rows}, f, indent=2)
print("[phaseA] wrote results_perf/bench_ab.json")
EOF
  wait_tpu
  timeout 2400 env TPU_DIFFUSION_BENCH_ATTN=pallas_fused python scripts/hlo_traffic.py \
    --detail_category layout_copy --top 24 \
    --out results_perf/hlo_traffic_r5_fused.json \
    --save_hlo results_perf/hlo_tpu_r5_fused.txt.gz || true
fi

echo "[phaseA] ===== end $(date -u) ====="
