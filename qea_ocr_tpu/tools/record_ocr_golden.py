"""Record golden OCR fixtures for the gated engine backends.

Run ONCE on a machine that has the real engines installed:

    python -m qea_ocr_tpu.tools.record_ocr_golden

With no `--engine`, the recorder PROBES for real tesserocr/easyocr and
upgrades the fixture of every engine it finds in place (erroring loudly
when none is installed and `--stub` was not passed). Every write is
schema-validated (`validate_fixture`) so recorder/test drift cannot
silently orphan the replay tests.

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


# fixture schema contract — the replay tests (`tests/test_ocr_backends.py`)
# and this recorder must agree on it; `validate_fixture` fails loudly on
# drift so a recorder or test change cannot silently orphan the other side.
_ENGINE_MODULE = {"Tesseract": "tesserocr", "EasyOCR": "easyocr"}
_N_STRIPS = 12


def validate_fixture(path: str) -> dict:
    """Load + schema-check one golden npz. Raises ValueError on drift."""
    data = np.load(path, allow_pickle=False)
    missing = {"images", "labels", "gt_texts", "engine_kind"} - set(data.files)
    if missing:
        raise ValueError(f"{path}: missing keys {sorted(missing)}")
    img = data["images"]
    if img.shape != (_N_STRIPS, 32, 128) or img.dtype != np.float32:
        raise ValueError(
            f"{path}: images must be ({_N_STRIPS}, 32, 128) float32, got "
            f"{img.shape} {img.dtype}")
    if data["labels"].shape != (_N_STRIPS,) or \
            data["gt_texts"].shape != (_N_STRIPS,):
        raise ValueError(f"{path}: labels/gt_texts must be ({_N_STRIPS},)")
    kind = str(data["engine_kind"])
    if kind not in ("stub", "real"):
        raise ValueError(f"{path}: engine_kind must be stub|real, got {kind!r}")
    return dict(images=img, labels=data["labels"],
                gt_texts=data["gt_texts"], engine_kind=kind)


def engine_available(engine: str) -> bool:
    """Probe for the REAL engine module (no stubs installed)."""
    import importlib
    import sys
    mod = _ENGINE_MODULE[engine]
    if mod in sys.modules:
        # an installed stub (types.ModuleType, no __file__) must not make
        # the real engine look present
        return getattr(sys.modules[mod], "__file__", None) is not None
    try:
        importlib.import_module(mod)
        return True
    except ImportError:
        return False


def record(engine: str, out_dir: str, stub: bool) -> str:
    if stub:
        from qea_ocr_tpu.ocr.stub_engines import install_stub_engines
        install_stub_engines()
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    backend = get_ocr_helper(engine)
    images, gt_texts = build_strips()
    labels = backend.get_labels(images)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{engine.lower()}.npz")
    prev_kind = None
    if os.path.exists(out):
        prev_kind = validate_fixture(out)["engine_kind"]
    np.savez_compressed(out, images=images, labels=np.asarray(labels),
                        gt_texts=np.asarray(gt_texts),
                        engine_kind=np.asarray("stub" if stub else "real"))
    validate_fixture(out)  # loud failure if the recorder drifted the schema
    kind = "stub" if stub else "real"
    note = f" (was {prev_kind})" if prev_kind and prev_kind != kind else ""
    print(f"recorded {len(labels)} {kind}-engine golden outputs{note} "
          f"-> {out}")
    for g, l in zip(gt_texts, labels):
        print(f"  {g!r} -> {l!r}")
    return out


def main():
    ap = argparse.ArgumentParser(
        description="Record golden OCR fixtures. With no --engine: probe "
                    "for real tesserocr/easyocr and upgrade every fixture "
                    "a real engine exists for, in place — the one-command "
                    "path on an engine-equipped machine.")
    ap.add_argument("--engine", choices=["Tesseract", "EasyOCR"],
                    help="record just this engine (default: all available)")
    ap.add_argument("--stub", action="store_true",
                    help="record against the deterministic stub engines "
                         "(ocr/stub_engines.py) instead of the real ones")
    ap.add_argument("--out_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "tests", "fixtures", "ocr_golden"))
    args = ap.parse_args()

    engines = [args.engine] if args.engine else list(_ENGINE_MODULE)
    if not args.stub:
        available = [e for e in engines if engine_available(e)]
        skipped = sorted(set(engines) - set(available))
        if not available:
            raise SystemExit(
                f"no real engine available for {engines} (probe for "
                f"{[_ENGINE_MODULE[e] for e in engines]} failed); install "
                "one, or pass --stub to record stub-contract fixtures")
        if skipped:
            print(f"skipping {skipped}: real engine not installed")
        engines = available
    for engine in engines:
        record(engine, args.out_dir, args.stub)


if __name__ == "__main__":
    main()
