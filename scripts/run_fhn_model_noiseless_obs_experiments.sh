#!/usr/bin/env bash
# Grid driver for the FHN noiseless-obs CHMC experiments: sweeps the blocked
# subsequence size R, steps-per-observation S and number of observations T
# over seeds and Hamiltonian splittings, then runs the per-operation timing
# benchmark. TPU-native counterpart of the reference's
# run_fhn_model_noiseless_obs_experiments.sh grid.
set -euo pipefail
cd "$(dirname "$0")"

SEEDS=(${SEEDS:-20200710 20200711 20200712})
SPLITTINGS=(${SPLITTINGS:-standard gaussian})
R_GRID=(${R_GRID:-2 5 10 20 50 100})
S_GRID=(${S_GRID:-25 50 100 200 400})
T_GRID=(${T_GRID:-25 50 100 200 400})
COMMON=(${COMMON:-})

for seed in "${SEEDS[@]}"; do
  for splitting in "${SPLITTINGS[@]}"; do
    for R in "${R_GRID[@]}"; do
      python fhn_model_noiseless_obs_chmc_experiment.py \
        --seed "$seed" --splitting "$splitting" --num-obs-per-subseq "$R" \
        "${COMMON[@]}"
    done
    for S in "${S_GRID[@]}"; do
      python fhn_model_noiseless_obs_chmc_experiment.py \
        --seed "$seed" --splitting "$splitting" --num-steps-per-obs "$S" \
        "${COMMON[@]}"
    done
    for T in "${T_GRID[@]}"; do
      python fhn_model_noiseless_obs_chmc_experiment.py \
        --seed "$seed" --splitting "$splitting" --num-obs "$T" \
        "${COMMON[@]}"
    done
  done
done

python fhn_model_noiseless_obs_chmc_operation_times.py
