#!/usr/bin/env bash
# CRNN-warmup launcher (counterpart of reference compute_canada/run_crnn_warmup.sh).
set -euo pipefail
DATA=${DATA:-$PWD/data}
OUT=${OUT:-$PWD/outputs/crnn_trained_model/model}
OCR=${OCR:-Tesseract}

python -m qea_ocr_tpu.cli.train_crnn \
  --data_base_path "$DATA" \
  --crnn_model_path "$OUT" \
  --ocr "$OCR" --dataset pos \
  --batch_size 64 --epoch 50 "$@"
