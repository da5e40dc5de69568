#!/usr/bin/env bash
# Grid driver for the SIR boarding-school experiments: CHMC and HMC over a
# grid of observation noise levels (negative = inferred) and seeds.
# TPU-native counterpart of the reference's run_sir_model_experiments.sh.
set -euo pipefail
cd "$(dirname "$0")"

SEEDS=(${SEEDS:-20200710 20200711 20200712})
SIGMAS=(${SIGMAS:-0.3162 1 3.162 10 -1})
COMMON=(${COMMON:-})

for seed in "${SEEDS[@]}"; do
  for sigma in "${SIGMAS[@]}"; do
    python sir_model_chmc_experiment.py \
      --seed "$seed" --observation-noise-std "$sigma" "${COMMON[@]}"
    python sir_model_hmc_experiment.py \
      --seed "$seed" --observation-noise-std "$sigma" "${COMMON[@]}"
  done
done
