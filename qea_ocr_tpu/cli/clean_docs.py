"""Serving CLI: clean a directory of document images with a trained prep
model, optionally transcribing the cleaned output.

No reference counterpart — the reference's only way to apply a trained
preprocessor was the evaluator (`eval_prep.py`); this is the deployment
surface for the trained artifact.

Run: python -m qea_ocr_tpu.cli.clean_docs --prep_path <ckpt> \
       --input_dir docs/ --output_dir cleaned/ [--ocr Tesseract \
       --transcripts transcripts.json]
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Batch document cleaning with a trained preprocessor")
    p.add_argument("--prep_path", required=True)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ocr", default=None,
                   help="optional OCR backend to transcribe cleaned docs")
    p.add_argument("--transcripts", default=None,
                   help="JSON output path for transcriptions (with --ocr)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--unet_features", type=int, default=32)
    p.add_argument("--doc_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="processing canvas (default: config DOC_SIZE)")
    p.add_argument("--mxu_packed", action="store_true",
                   help="force the space-to-depth packed conv layout "
                        "(ops/s2d.py). Default: auto — packed on TPU when "
                        "the per-device batch is in the measured 16-48 win "
                        "window (+26%% docs/s at 32), vanilla otherwise; "
                        "QEA_MXU_PACKED=0/1 also forces either way")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all local chips (params "
                        "replicated); batch_size rounds up to a device "
                        "multiple")
    return p


def main(argv=None):
    from qea_ocr_tpu.utils.platform import setup_platform
    setup_platform()
    args = build_parser().parse_args(argv)

    from qea_ocr_tpu.ocr.base import get_ocr_helper
    from qea_ocr_tpu.serve import DocumentCleaner

    ocr = get_ocr_helper(args.ocr, is_eval=True) if args.ocr else None
    if args.ocr and ocr is None:
        raise ValueError(f"unknown OCR backend {args.ocr!r}")
    kw = {"doc_size": tuple(args.doc_size)} if args.doc_size else {}
    if args.mxu_packed:
        kw["mxu_packed"] = True
    cleaner = DocumentCleaner(
        args.prep_path, unet_features=args.unet_features,
        batch_size=args.batch_size, data_parallel=args.data_parallel, **kw)
    t0 = time.perf_counter()
    result = cleaner.clean_dir(
        args.input_dir, args.output_dir, ocr=ocr,
        transcripts_path=args.transcripts)
    result["seconds"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
