#!/usr/bin/env bash
# Prep-evaluation launcher (counterpart of compute_canada/run_prep_eval*.sh).
# Evaluates one or more checkpoints sequentially.
set -euo pipefail
DATA=${DATA:-$PWD/data}
OCR=${OCR:-Tesseract}

for ckpt in "$@"; do
  echo "== $ckpt =="
  python -m qea_ocr_tpu.cli.eval_prep \
    --data_base_path "$DATA" --ocr "$OCR" \
    --dataset patch_dataset --show_orig \
    --prep_path "$ckpt"
done
