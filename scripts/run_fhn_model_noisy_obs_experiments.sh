#!/usr/bin/env bash
# Grid driver for the FHN noisy-obs experiments: CHMC and HMC over a grid of
# observation noise levels (negative = inferred), splittings and seeds.
# TPU-native counterpart of the reference's run_fhn_model_noisy_obs_experiments.sh.
set -euo pipefail
cd "$(dirname "$0")"

SEEDS=(${SEEDS:-20200710 20200711 20200712})
SIGMAS=(${SIGMAS:-0.01 0.03162 0.1 0.3162})
METRICS=(${METRICS:-identity block})
COMMON=(${COMMON:-})

for seed in "${SEEDS[@]}"; do
  for sigma in "${SIGMAS[@]}"; do
    python fhn_model_noisy_obs_chmc_experiment.py \
      --seed "$seed" --observation-noise-std "$sigma" "${COMMON[@]}"
    for metric in "${METRICS[@]}"; do
      python fhn_model_noisy_obs_hmc_experiment.py \
        --seed "$seed" --observation-noise-std "$sigma" \
        --metric-type "$metric" "${COMMON[@]}"
    done
  done
done
