#!/usr/bin/env bash
# Sweep job-array launcher (counterpart of compute_canada/run_*_sweep.sh +
# run_nn_patch_training_array.sh): N parallel workers, one optuna trial each,
# coordinated through a shared sqlite RDB exactly like the reference's
# SLURM-array pattern.
set -euo pipefail
N=${N:-4}
DB=${DB:-sqlite:///$PWD/sweep.db}

for i in $(seq 1 "$N"); do
  python -m qea_ocr_tpu.sweeps.sweep --which patch --n_trials 1 \
    --storage "$DB" --study_name qea_patch_sweep "$@" &
done
wait
