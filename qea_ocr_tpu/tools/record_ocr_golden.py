"""Record golden OCR fixtures for the gated engine backends.

Run ONCE on a machine that has the real engines installed:

    python -m qea_ocr_tpu.tools.record_ocr_golden --engine Tesseract
    python -m qea_ocr_tpu.tools.record_ocr_golden --engine EasyOCR

Renders a dozen synthetic text strips (clean + lightly corrupted), runs the
real engine on them, and writes `tests/fixtures/ocr_golden/<engine>.npz`
with the images, the engine's outputs, and an `engine_kind` marker
("real"). `tests/test_ocr_backends.py`'s golden-replay test then asserts
the backend reproduces these outputs byte-for-byte wherever the engine
exists — executed-code conformance for `ocr/tesseract.py` /
`ocr/easyocr_backend.py` beyond the hermetic stub tests.

`--stub` records the same fixtures against the deterministic stub engines
(`ocr/stub_engines.py`, engine_kind="stub"): the shipped stub-contract
recordings that let the replay test RUN in engine-less images — it pins
the backends' end-to-end normalization pipeline against committed bytes,
so a behavior change in `get_labels` (PIL conversion, empty->EMPTY_CHAR,
unicode folding, length caps) fails replay even where no engine exists.
A real-engine recording, where available, simply overwrites the stub one.

Reference behaviors being pinned: `ocr_helper/tess_helper.py:20-44`
(PSM SINGLE_LINE + OEM LSTM_ONLY strip recognition, train-mode label
normalization), `ocr_helper/eocr_helper.py:21-44` (paragraph readtext).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_strips(seed: int = 0):
    from qea_ocr_tpu.data.synth import corrupt, render_text_strip

    rng = np.random.default_rng(seed)
    texts = ["HELLO", "WORLD 42", "TOTAL 9.99", "INVOICE 123", "CASH",
             "ITEM A-1", "QTY 3", "DATE 2024", "SUBTOTAL", "TAX 0.07",
             "RECEIPT", "THANK YOU"]
    images = []
    for i, t in enumerate(texts):
        img = render_text_strip(t, 32, 128)
        if i % 2:  # half the fixtures lightly corrupted
            img = corrupt(rng, img, noise_std=0.08, shading=0.1,
                          salt_pepper=0.0)
        images.append(img)
    return np.stack(images), texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=["Tesseract", "EasyOCR"],
                    required=True)
    ap.add_argument("--stub", action="store_true",
                    help="record against the deterministic stub engines "
                         "(ocr/stub_engines.py) instead of the real ones")
    ap.add_argument("--out_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "tests", "fixtures", "ocr_golden"))
    args = ap.parse_args()

    if args.stub:
        from qea_ocr_tpu.ocr.stub_engines import install_stub_engines
        install_stub_engines()
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    backend = get_ocr_helper(args.engine)
    images, gt_texts = build_strips()
    labels = backend.get_labels(images)
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{args.engine.lower()}.npz")
    np.savez_compressed(out, images=images, labels=np.asarray(labels),
                        gt_texts=np.asarray(gt_texts),
                        engine_kind=np.asarray(
                            "stub" if args.stub else "real"))
    print(f"recorded {len(labels)} {'stub' if args.stub else 'real'}-engine "
          f"golden outputs -> {out}")
    for g, l in zip(gt_texts, labels):
        print(f"  {g!r} -> {l!r}")


if __name__ == "__main__":
    main()
