#!/usr/bin/env bash
# CRNN (proxy) evaluation launcher — counterpart of
# `compute_canada/run_crnn_eval.sh`. Scores the proxy's own decoded
# predictions against GT (and OCR-on-original with --show_orig).
set -euo pipefail
DATA=${DATA:-$PWD/data}
OCR=${OCR:-Tesseract}

for ckpt in "$@"; do
  echo "== $ckpt =="
  python -m qea_ocr_tpu.cli.eval_crnn \
    --data_base_path "$DATA" --ocr "$OCR" \
    --dataset vgg \
    --crnn_path "$ckpt"
done
