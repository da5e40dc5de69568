#!/usr/bin/env bash
# Canonical noisy-obs HMC on the TPU chip: 256 chains, S=40, depth 20,
# 500 warm-up + 2500 main iterations (reference defaults,
# scripts/fhn_model_noisy_obs_hmc_experiment.py + utils.py:94-101).
#
# The run takes hours through the tunnel and the worker can fault at any
# point, so each attempt is time-bounded and the loop resumes from the
# host-loop checkpoint in the FIXED output dir until the summary lands.
set -uo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-experiments/fhn_noisy_hmc_canonical_tpu/run}
ATTEMPT_SECONDS=${2:-5400}
MAX_ATTEMPTS=${3:-20}

mkdir -p "$(dirname "$OUT")"
for i in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "[canonical-hmc] attempt $i/$MAX_ATTEMPTS ($(date -Is))"
  timeout "$ATTEMPT_SECONDS" python scripts/fhn_model_noisy_obs_hmc_experiment.py \
    --output-dir "$OUT" --num-chain 256 --observation-noise-std 0.1 \
    --num-warm-up-iter 500 --num-main-iter 2500
  rc=$?
  if [ -f "$OUT/summary.json" ]; then
    echo "[canonical-hmc] summary landed (rc=$rc)"
    exit 0
  fi
  echo "[canonical-hmc] attempt $i ended rc=$rc without summary; resuming"
  sleep 30
done
echo "[canonical-hmc] exhausted attempts without a summary" >&2
exit 1
