"""qea_ocr_tpu — TPU-native framework for query-efficient black-box OCR approximation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
tataganesh/Query-Efficient-Approx-to-improve-OCR ("Document Image Cleaning
using Budget-Aware Black-Box Approximation", arXiv:2306.13236):

  * a UNet document-image *preprocessor* trained so a black-box OCR engine
    reads the cleaned image better,
  * a differentiable CRNN *proxy* trained to mimic the OCR's outputs,
  * a query-budget layer that selects which samples may query the OCR each
    step, with label-history tracking and weighted CTC losses for the rest.

Design stance (TPU-first, not a port):
  * every per-sample Python loop in the reference is a batched, masked,
    jitted device op here (CTC decode, Levenshtein CER, crop+pad text-strip
    extraction, selection strategies, weighted history CTC);
  * ragged structure (strips per document, label lengths) is fixed-shape
    padding + masks so whole train steps compile once;
  * the black-box OCR is an explicit host-side async query engine at the
    only unavoidable host boundary;
  * multi-chip scaling is a `jax.sharding.Mesh` data-parallel layer, not a
    communication library.
"""

__version__ = "0.1.0"

from qea_ocr_tpu import config as config  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import qea_ocr_tpu` light)."""
    import importlib
    lazy = {
        "CharMap": ("qea_ocr_tpu.utils.charmap", "CharMap"),
        "CRNN": ("qea_ocr_tpu.models", "CRNN"),
        "UNet": ("qea_ocr_tpu.models", "UNet"),
        "HistoryAttention": ("qea_ocr_tpu.models", "HistoryAttention"),
        "get_ocr_helper": ("qea_ocr_tpu.ocr.base", "get_ocr_helper"),
        "OcrQueryEngine": ("qea_ocr_tpu.ocr.engine", "OcrQueryEngine"),
        "TrainCRNN": ("qea_ocr_tpu.train.crnn_trainer", "TrainCRNN"),
        "TrainNNPrep": ("qea_ocr_tpu.train.patch_trainer", "TrainNNPrep"),
        "TrainNNPrepArea": ("qea_ocr_tpu.train.area_trainer", "TrainNNPrepArea"),
        "EvalPrep": ("qea_ocr_tpu.eval.eval_prep", "EvalPrep"),
        "EvalCRNN": ("qea_ocr_tpu.eval.eval_crnn", "EvalCRNN"),
        "prep_eval": ("qea_ocr_tpu.eval.eval_utils", "prep_eval"),
    }
    if name in lazy:
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
