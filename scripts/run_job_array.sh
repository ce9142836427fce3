#!/usr/bin/env bash
# Generic job-array launcher — counterpart of the reference's SLURM-array
# pattern (`compute_canada/run_nn_patch_training_array.sh:60-61`): a
# `job_array` file holds one full command line per row; each array task
# evals its own row. Works under SLURM (SLURM_ARRAY_TASK_ID), Cloud Batch
# (BATCH_TASK_INDEX, 0-based), or manually: TASK_ID=3 scripts/run_job_array.sh.
set -euo pipefail

JOB_FILE=${JOB_FILE:-job_array}
if [ -n "${TASK_ID:-}" ]; then
  row=$TASK_ID
elif [ -n "${SLURM_ARRAY_TASK_ID:-}" ]; then
  # rows are 1-based. A 0-based array (--array=0-N) is detected via
  # SLURM_ARRAY_TASK_MIN and auto-shifted up by one so EVERY task maps to
  # the right row (without this, task 0 errors loudly but tasks 1..N-1
  # silently run the wrong rows and the last row never runs).
  offset=${JOB_ARRAY_BASE_OFFSET:-}
  if [ -z "$offset" ]; then
    if [ "${SLURM_ARRAY_TASK_MIN:-1}" -eq 0 ]; then offset=1; else offset=0; fi
  fi
  row=$((SLURM_ARRAY_TASK_ID + offset))
elif [ -n "${BATCH_TASK_INDEX:-}" ]; then
  row=$((BATCH_TASK_INDEX + 1))   # Cloud Batch indices are 0-based
else
  echo "set TASK_ID (1-based row of $JOB_FILE), or run under SLURM" \
       "(SLURM_ARRAY_TASK_ID; add JOB_ARRAY_BASE_OFFSET=1 for --array=0-N)" \
       "or Cloud Batch (BATCH_TASK_INDEX)" >&2
  exit 1
fi
if [ "$row" -lt 1 ]; then
  echo "row $row is invalid: rows are 1-based (0-based SLURM arrays need" \
       "JOB_ARRAY_BASE_OFFSET=1)" >&2
  exit 1
fi

command=$(sed -n "${row}p" "$JOB_FILE")
[ -n "$command" ] || { echo "no row $row in $JOB_FILE" >&2; exit 1; }
echo "[job_array] row $row: $command" >&2
eval "$command"
