#!/usr/bin/env bash
# Small CPU grid exercising every experiment CLI and the complete plot
# pipeline (the reference's figure set: tau_eff grids with R-hat > 1.01
# cross markers, CHMC-vs-HMC posterior overlays, SIR histogram/pair plots
# -- reference scripts/fhn_model_noisy_obs_generate_plots.py:35-76 and
# scripts/sir_model_generate_plots.py:134-197).
#
# Sizes are deliberately tiny (minutes on one CPU); the canonical grids
# live in run_fhn_model_*_experiments.sh / run_sir_model_experiments.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-experiments_smoke}
FIGS=${2:-figures_smoke}
RUN="env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu"

# --- FHN noiseless CHMC: R x seed grid + one Gaussian-splitting run ------- #
for R in 2 5; do
  for seed in 0 1; do
    $RUN python scripts/fhn_model_noiseless_obs_chmc_experiment.py \
      --output-root-dir "$ROOT" --num-obs 25 --num-steps-per-obs 10 \
      --num-obs-per-subseq "$R" --num-chain 2 --seed "$seed" \
      --num-warm-up-iter 25 --num-main-iter 50
  done
done
$RUN python scripts/fhn_model_noiseless_obs_chmc_experiment.py \
  --output-root-dir "$ROOT" --num-obs 25 --num-steps-per-obs 10 \
  --num-obs-per-subseq 5 --num-chain 2 --seed 0 --splitting gaussian \
  --num-warm-up-iter 25 --num-main-iter 50

# --- FHN noisy obs: CHMC vs HMC at two noise levels ----------------------- #
for sigma in 0.1 0.31622776601683794; do
  $RUN python scripts/fhn_model_noisy_obs_chmc_experiment.py \
    --output-root-dir "$ROOT" --num-steps-per-obs 10 --num-chain 2 \
    --observation-noise-std "$sigma" \
    --num-warm-up-iter 25 --num-main-iter 50
  $RUN python scripts/fhn_model_noisy_obs_hmc_experiment.py \
    --output-root-dir "$ROOT" --num-steps-per-obs 10 --num-chain 2 \
    --observation-noise-std "$sigma" --max-tree-depth 8 \
    --num-warm-up-iter 25 --num-main-iter 50
done

# --- SIR boarding-school data: CHMC vs HMC at two noise levels ------------ #
for sigma in 1.0 3.1622776601683795; do
  $RUN python scripts/sir_model_chmc_experiment.py \
    --output-root-dir "$ROOT" --num-steps-per-obs 5 --num-chain 2 \
    --observation-noise-std "$sigma" \
    --num-warm-up-iter 25 --num-main-iter 50
  $RUN python scripts/sir_model_hmc_experiment.py \
    --output-root-dir "$ROOT" --num-steps-per-obs 5 --num-chain 2 \
    --observation-noise-std "$sigma" --max-tree-depth 8 \
    --num-warm-up-iter 25 --num-main-iter 50
done

# --- The full figure set --------------------------------------------------- #
$RUN python scripts/fhn_model_noiseless_obs_generate_plots.py \
  --experiment-dir "$ROOT" --output-dir "$FIGS"
$RUN python scripts/fhn_model_noisy_obs_generate_plots.py \
  --experiment-dir "$ROOT" --output-dir "$FIGS"
$RUN python scripts/sir_model_generate_plots.py \
  --experiment-dir "$ROOT" --output-dir "$FIGS"

ls -la "$FIGS"
