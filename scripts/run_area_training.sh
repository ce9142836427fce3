#!/usr/bin/env bash
# TPU-pod launcher for budget-aware textarea (word-crop) training.
#
# Counterpart of reference `compute_canada/run_nn_area_training.sh` (SLURM /
# single V100; 4% VGG budget = --minibatch_subset_prop 0.93, reference
# run_nn_area_training.sh:42). Per-worker on a TPU slice, single-chip as-is.
set -euo pipefail

DATA=${DATA:-$PWD/data}
EXP=${EXP:-$PWD/exp_out/area_$(date +%Y%m%d_%H%M%S)}
OCR=${OCR:-Tesseract}
BUDGET_PROP=${BUDGET_PROP:-0.93}

python -m qea_ocr_tpu.cli.area_cli \
  --data_base_path "$DATA" \
  --exp_base_path "$EXP" \
  --ocr "$OCR" \
  --minibatch_subset rangeCER \
  --minibatch_subset_prop "$BUDGET_PROP" \
  --inner_limit 2 --inner_limit_skip \
  --window_size 3 --weightgen_method decaying \
  --cers_ocr_path "$DATA/all_cers_textarea.json" \
  --batch_size 64 \
  --epoch 50 "$@"
