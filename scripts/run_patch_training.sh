#!/usr/bin/env bash
# TPU-pod launcher for budget-aware patch training.
#
# Counterpart of reference `compute_canada/run_nn_patch_training.sh` (SLURM /
# single V100). On Cloud TPU the launcher is per-worker: run this script on
# every host of the slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`)
# with QEA_DISTRIBUTED=1 — jax.distributed auto-detects the pod topology,
# and the trainer pins a per-host document subset, fans the OCR out per
# host, and shards the global batch over all chips (`--data_parallel`).
# For a manual cluster set QEA_COORDINATOR=host:port QEA_NUM_PROCESSES=N
# QEA_PROCESS_ID=i as well. Single-host single-chip works as-is.
#
# The 4% POS query budget corresponds to --minibatch_subset_prop 0.95
# (reference README.md:34); 8% ~ 0.87.
set -euo pipefail

DATA=${DATA:-$PWD/data}
EXP=${EXP:-$PWD/exp_out/patch_$(date +%Y%m%d_%H%M%S)}
OCR=${OCR:-Tesseract}
BUDGET_PROP=${BUDGET_PROP:-0.95}

python -m qea_ocr_tpu.cli.patch_cli \
  --data_base_path "$DATA" \
  --exp_base_path "$EXP" \
  --ocr "$OCR" \
  --minibatch_subset rangeCER \
  --minibatch_subset_prop "$BUDGET_PROP" \
  --inner_limit 2 --inner_limit_skip \
  --window_size 3 --weightgen_method decaying \
  --cers_ocr_path "$DATA/pos_dataset_cers.json" \
  --batch_docs 8 --max_strips 32 \
  --epoch 50 "$@"
