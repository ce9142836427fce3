#!/usr/bin/env bash
# Generic job-array launcher — counterpart of the reference's SLURM-array
# pattern (`compute_canada/run_nn_patch_training_array.sh:60-61`): a
# `job_array` file holds one full command line per row; each array task
# evals its own row. Works under SLURM (SLURM_ARRAY_TASK_ID), Cloud Batch
# (BATCH_TASK_INDEX, 0-based), or manually: TASK_ID=3 scripts/run_job_array.sh.
set -euo pipefail

JOB_FILE=${JOB_FILE:-job_array}
row=${TASK_ID:-${SLURM_ARRAY_TASK_ID:-$((${BATCH_TASK_INDEX:-0} + 1))}}

command=$(sed -n "${row}p" "$JOB_FILE")
[ -n "$command" ] || { echo "no row $row in $JOB_FILE" >&2; exit 1; }
echo "[job_array] row $row: $command" >&2
eval "$command"
