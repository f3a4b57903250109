#!/bin/bash
# Round-5 master chip schedule: phase A (attention A/B decision data) ->
# chain 1 (50k retrain + dopri5 FID leg) -> chain 2 (conditioning sweep,
# outpainting, flowers, 256px, class-conditional, celeba). One process so
# the chip stays saturated across session restarts; every step inside is
# guarded by its result file and safe to re-invoke.
cd /root/repo || exit 1
echo "$$" > /tmp/r5_master.pid
bash scripts/r5_phaseA.sh
bash scripts/r5_chain.sh
bash scripts/r5_chain2.sh
echo "[master] all chains done $(date -u)" >> /tmp/r5_master.log
