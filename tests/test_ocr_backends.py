"""Executed-code coverage for the gated Tesseract/EasyOCR backends.

The real engines are absent from this image, so these tests run the
backends' ACTUAL code paths (thread-local PyTessBaseAPI pooling, PSM/OEM
configuration, PIL conversion, readtext kwargs, label normalization,
concurrent budget accounting) against behaviorally-faithful stub engine
modules injected into sys.modules. A separate golden-replay test runs the
same assertions against the real engines wherever they exist (recorded
fixtures via tools/record_ocr_golden.py), and is skipped here.

Reference semantics: `ocr_helper/tess_helper.py:10-44`,
`ocr_helper/eocr_helper.py:11-52`.
"""

import importlib
import os
import sys
import threading
import types

import numpy as np
import pytest

from qea_ocr_tpu.data.synth import make_word_crop, render_text_strip

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "ocr_golden")


# ---------------------------------------------------------------------------
# stub tesserocr: recognizes synthetic bitmap-font strips via the same
# template matching FakeOCR uses, so recognition is deterministic and the
# backend's plumbing (not the engine) is what's under test.
# ---------------------------------------------------------------------------
class _StubApi:
    created = []          # (thread_name, kwargs) per constructed handle
    lock = threading.Lock()

    def __init__(self, **kwargs):
        with _StubApi.lock:
            _StubApi.created.append(
                (threading.current_thread().name, dict(kwargs)))
        self.kwargs = kwargs
        self._img = None
        self._owner = threading.get_ident()
        self._busy = False

    def SetImage(self, pil_img):
        # a persistent handle is not thread-safe: flag concurrent reuse
        assert not self._busy, "PyTessBaseAPI handle used concurrently"
        self._img = pil_img

    def GetUTF8Text(self):
        self._busy = True
        try:
            from qea_ocr_tpu.ocr.fake import FakeOcrBackend
            arr = np.asarray(self._img, dtype=np.float32) / 255.0
            return FakeOcrBackend()._recognize(arr) + "\n"
        finally:
            self._busy = False


def _install_stub_tesserocr(monkeypatch):
    stub = types.ModuleType("tesserocr")
    stub.PyTessBaseAPI = _StubApi
    stub.PSM = types.SimpleNamespace(SINGLE_LINE="psm7", SINGLE_BLOCK="psm6")
    stub.OEM = types.SimpleNamespace(LSTM_ONLY="oem1")
    monkeypatch.setitem(sys.modules, "tesserocr", stub)
    import qea_ocr_tpu.ocr.tesseract as mod
    importlib.reload(mod)
    assert mod.HAVE_TESSEROCR
    _StubApi.created.clear()
    return mod


@pytest.fixture
def tess_mod(monkeypatch):
    mod = _install_stub_tesserocr(monkeypatch)
    yield mod
    # restore the gated (engine-absent) module state for other tests
    sys.modules.pop("tesserocr", None)
    importlib.reload(mod)


def _strips(texts):
    return np.stack([render_text_strip(t, 32, 128) for t in texts])


class TestTesseractBackend:
    def test_get_labels_reads_clean_strips(self, tess_mod):
        be = tess_mod.TesseractBackend(num_threads=2)
        texts = ["HELLO", "WORLD 42", "TOTAL 9.99"]
        labels = be.get_labels(_strips(texts))
        assert labels == texts
        assert be.count_calls == 3

    def test_line_api_config_and_pooling(self, tess_mod):
        """One SINGLE_LINE+LSTM_ONLY handle per worker thread (plus the
        SINGLE_BLOCK doc handle), reused across batches."""
        be = tess_mod.TesseractBackend(num_threads=3)
        texts = ["A%d" % i for i in range(12)]
        be.get_labels(_strips(texts))
        be.get_labels(_strips(texts))      # second batch: no new handles
        line_apis = [k for _, k in _StubApi.created if k.get("psm") == "psm7"]
        block_apis = [k for _, k in _StubApi.created if k.get("psm") == "psm6"]
        assert len(block_apis) == 1
        assert 1 <= len(line_apis) <= 3    # one per pool thread, cached
        assert all(k.get("oem") == "oem1" for k in line_apis)
        threads = {t for t, k in _StubApi.created if k.get("psm") == "psm7"}
        assert len(threads) == len(line_apis)  # thread-local, not shared

    def test_normalization_empty_and_overlong(self, tess_mod):
        be = tess_mod.TesseractBackend(num_threads=2)
        blank = np.ones((1, 32, 128), np.float32)   # no ink -> '' -> ' '
        assert be.get_labels(blank) == [" "]
        # eval mode skips unicode-folding/length-cap but keeps the
        # empty -> EMPTY_CHAR mapping (reference tess_helper semantics)
        be_eval = tess_mod.TesseractBackend(num_threads=2, is_eval=True)
        assert be_eval.get_labels(blank) == [" "]

    def test_concurrent_budget_accounting(self, tess_mod):
        """get_labels from many threads: count_calls must not drop
        increments and stub handles must never be shared mid-recognition."""
        be = tess_mod.TesseractBackend(num_threads=4)
        strips = _strips(["X1", "X2", "X3", "X4", "X5"])
        n_callers, reps = 6, 4

        def worker():
            for _ in range(reps):
                be.get_labels(strips)

        ts = [threading.Thread(target=worker) for _ in range(n_callers)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert be.count_calls == n_callers * reps * len(strips)

    def test_get_string_block_path(self, tess_mod):
        be = tess_mod.TesseractBackend(num_threads=2)
        doc = render_text_strip("TOTAL 42", 32, 128)
        words = be.get_string(doc)
        assert words == ["TOTAL", "42"]

    def test_channel_axis_squeeze(self, tess_mod):
        be = tess_mod.TesseractBackend(num_threads=2)
        s = _strips(["ABC"])[:, None]       # (B, 1, H, W)
        assert be.get_labels(s) == ["ABC"]


# ---------------------------------------------------------------------------
# stub easyocr
# ---------------------------------------------------------------------------
class _StubReader:
    init_args = None
    last_kwargs = None

    def __init__(self, langs, gpu=True):
        _StubReader.init_args = (langs, gpu)

    def readtext(self, arr, **kwargs):
        _StubReader.last_kwargs = kwargs
        from qea_ocr_tpu.ocr.fake import FakeOcrBackend
        img = np.asarray(arr, dtype=np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        text = FakeOcrBackend()._recognize(img)
        return [text] if text else []


@pytest.fixture
def eocr_mod(monkeypatch):
    stub = types.ModuleType("easyocr")
    stub.Reader = _StubReader
    monkeypatch.setitem(sys.modules, "easyocr", stub)
    import qea_ocr_tpu.ocr.easyocr_backend as mod
    importlib.reload(mod)
    yield mod
    sys.modules.pop("easyocr", None)
    importlib.reload(mod)


class TestEasyOcrBackend:
    def test_get_labels_and_readtext_kwargs(self, eocr_mod):
        be = eocr_mod.EasyOcrBackend()
        labels = be.get_labels(_strips(["CASH 12", "ITEM"]))
        assert labels == ["CASH 12", "ITEM"]
        # reference eocr_helper.py:21-44 readtext configuration
        kw = _StubReader.last_kwargs
        assert kw.get("detail") == 0
        assert kw.get("paragraph") is True
        assert kw.get("width_ths") == 35.0
        assert kw.get("height_ths") == 35.0
        assert kw.get("ycenter_ths") == 35.0

    def test_empty_result_maps_to_empty_char(self, eocr_mod):
        be = eocr_mod.EasyOcrBackend()
        blank = np.ones((1, 32, 128), np.float32)
        assert be.get_labels(blank) == [" "]


# ---------------------------------------------------------------------------
# golden replay against the REAL engines (skipped where absent)
# ---------------------------------------------------------------------------
def _golden(path):
    f = os.path.join(FIXTURE_DIR, path)
    return f if os.path.exists(f) else None


@pytest.mark.skipif(
    importlib.util.find_spec("tesserocr") is None
    or _golden("tesseract.npz") is None,
    reason="real tesserocr or recorded golden fixtures unavailable")
def test_tesseract_golden_replay():
    """On a machine with tesserocr: the backend must reproduce the recorded
    engine outputs (tools/record_ocr_golden.py) for the shipped strips."""
    from qea_ocr_tpu.ocr.tesseract import TesseractBackend
    data = np.load(_golden("tesseract.npz"), allow_pickle=True)
    be = TesseractBackend(num_threads=4)
    labels = be.get_labels(data["images"])
    assert labels == list(data["labels"])
