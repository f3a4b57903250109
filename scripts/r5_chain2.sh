#!/bin/bash
# Round-5 chip schedule, phase 2 (run after r5_chain.sh frees the chip):
#
#   0. measured HLO-traffic dump (2 min) — saves the optimized TPU HLO to
#      disk so the layout-copy analysis can proceed OFFLINE while the
#      long evidence runs below hold the chip
#   1. conditioning-mechanism sweep (the reference's scientific core)
#   2. outpainting experiment cell (mnist,outpainting,amortized --mode all)
#   3. 64x64 amortized dataset cell (flowers,inpainting,amortized)
#   4. 256px stretch sampling evidence (train 400 steps + euler-100 bench
#      with flash engagement asserted)
#   5. class-conditional guided-OT-CFM + SF2M convergence runs
#
# Each step persists its results and skips when done; safe to re-invoke.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_tpu_diffusion}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
LOG=/tmp/r5_chain2.log
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
    echo "[chain5.2] $(date -u +%H:%M:%S) TPU probe $n failed; retry in 120s"
    sleep 120
  done
}

run_step() { # name, result_file, timeout_s, cmd...
  local name=$1 result=$2 tmo=$3
  shift 3
  if [ -e "$result" ]; then
    echo "[chain5.2] $name: result exists ($result), skipping"
    return 0
  fi
  for attempt in 1 2 3; do
    wait_tpu
    echo "[chain5.2] $(date -u +%H:%M:%S) $name attempt $attempt: $*"
    timeout "$tmo" "$@"
    rc=$?
    if [ $rc -eq 0 ] && [ -e "$result" ]; then
      echo "[chain5.2] $name DONE (attempt $attempt)"
      return 0
    fi
    echo "[chain5.2] $name attempt $attempt failed rc=$rc; backoff 120s"
    sleep 120
  done
  echo "[chain5.2] $name FAILED after 3 attempts"
  return 1
}

echo "[chain5.2] ===== start $(date -u) ====="
mkdir -p results_perf

# --- 0. HLO dump for offline layout analysis ----------------------------
run_step hlo_dump results_perf/hlo_tpu_r5.txt.gz 1800 \
  python scripts/hlo_traffic.py --save_hlo results_perf/hlo_tpu_r5.txt.gz \
  --detail_category layout_copy --top 24 --out results_perf/hlo_traffic_r5.json

# --- 0.5 attention-impl A/B on the bench workload ------------------------
# (the decision point for the layout-copy fix: fused-QKV kernel vs the XLA
# einsum path, same protocol; plus the fused program's traffic attribution)
if [ ! -e results_perf/bench_ab.json ]; then
  wait_tpu
  echo "[chain5.2] $(date -u +%H:%M:%S) bench A/B: xla"
  XLA_OUT=$(timeout 3000 env TPU_DIFFUSION_BENCH_ATTN=xla python bench.py | tail -1)
  echo "$XLA_OUT"
  wait_tpu
  echo "[chain5.2] $(date -u +%H:%M:%S) bench A/B: pallas_fused"
  FUSED_OUT=$(timeout 3000 env TPU_DIFFUSION_BENCH_ATTN=pallas_fused python bench.py | tail -1)
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
print("[chain5.2] wrote results_perf/bench_ab.json")
EOF
  wait_tpu
  timeout 1800 env TPU_DIFFUSION_BENCH_ATTN=pallas_fused python scripts/hlo_traffic.py \
    --detail_category layout_copy --top 24 \
    --out results_perf/hlo_traffic_r5_fused.json \
    --save_hlo results_perf/hlo_tpu_r5_fused.txt.gz || true
fi

# --- 1. conditioning-mechanism sweep ------------------------------------
# (idempotent per cell; generous outer timeout, retried by re-invocation)
for attempt in 1 2 3; do
  wait_tpu
  echo "[chain5.2] $(date -u +%H:%M:%S) conditioning_sweep attempt $attempt"
  timeout 12000 python scripts/conditioning_sweep.py \
    --workdir results_conditioning_sweep
  rc=$?
  if [ $rc -eq 0 ] && [ -e results_conditioning_sweep/aggregated.csv ]; then
    echo "[chain5.2] conditioning_sweep DONE"
    break
  fi
  echo "[chain5.2] conditioning_sweep attempt $attempt rc=$rc; backoff 120s"
  sleep 120
done

# --- 2. outpainting cell -------------------------------------------------
run_step outpainting results_outpainting/results.json 7200 \
  python -m tpu_diffusion.cli.main \
  --config mnist,outpainting,amortized --mode all \
  --workdir results_outpainting \
  --override training.num_steps=2000 \
  --override training.batch_size=64 \
  --override network.model_path=

# --- 3. flowers 64x64 amortized cell -------------------------------------
run_step flowers_amortized results_flowers_amortized/results.json 10000 \
  python -m tpu_diffusion.cli.main \
  --config flowers,inpainting,amortized --mode all \
  --workdir results_flowers_amortized \
  --override training.num_steps=1000 \
  --override training.batch_size=32 \
  --override network.model_path=

# --- 4. 256px stretch sampling evidence ----------------------------------
run_step sr256 results_sr256/bench.json 9000 \
  python scripts/sr256_bench.py --workdir results_sr256

# --- 5. class-conditional convergence runs --------------------------------
run_step cond_otcfm results_conditional/otcfm/class_trend.json 5400 \
  python -m tpu_diffusion.cli.train_conditional_mnist \
  --variant otcfm --num_steps 400 --batch_size 128 \
  --output_dir results_conditional --save_every 100

run_step cond_sf2m results_conditional/sf2m/class_trend.json 5400 \
  python -m tpu_diffusion.cli.train_conditional_mnist \
  --variant sf2m --num_steps 400 --batch_size 128 \
  --output_dir results_conditional --save_every 100

# --- 6. celeba 64x64 amortized (same geometry as flowers -> compile-cache
#        hits make this cell cheap) ---------------------------------------
run_step celeba_amortized results_celeba_amortized/results.json 10000 \
  python -m tpu_diffusion.cli.main \
  --config celeba,inpainting,amortized --mode all \
  --workdir results_celeba_amortized \
  --override training.num_steps=1000 \
  --override training.batch_size=32 \
  --override network.model_path=

echo "[chain5.2] ===== end $(date -u) ====="
