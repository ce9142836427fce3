"""Executed-code coverage for the gated Tesseract/EasyOCR backends.

The real engines are absent from this image, so these tests run the
backends' ACTUAL code paths (thread-local PyTessBaseAPI pooling, PSM/OEM
configuration, PIL conversion, readtext kwargs, label normalization,
concurrent budget accounting) against behaviorally-faithful stub engine
modules (`qea_ocr_tpu/ocr/stub_engines.py`) injected into sys.modules.
The golden-replay tests at the bottom replay the committed fixtures
(`tools/record_ocr_golden.py`): stub-contract fixtures
(engine_kind="stub", shipped in-repo) replay here against the stubs —
pinning the backends' full normalization pipeline against committed
bytes — and real-engine fixtures replay wherever the engine exists.

Reference semantics: `ocr_helper/tess_helper.py:10-44`,
`ocr_helper/eocr_helper.py:11-52`.
"""

import importlib
import os
import sys
import threading

import numpy as np
import pytest

from qea_ocr_tpu.data.synth import make_word_crop, render_text_strip
from qea_ocr_tpu.ocr.stub_engines import (
    StubReader as _StubReader,
    StubTessApi as _StubApi,
    make_stub_easyocr,
    make_stub_tesserocr,
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "ocr_golden")


def _install_stub_tesserocr(monkeypatch):
    monkeypatch.setitem(sys.modules, "tesserocr", make_stub_tesserocr())
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
@pytest.fixture
def eocr_mod(monkeypatch):
    monkeypatch.setitem(sys.modules, "easyocr", make_stub_easyocr())
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
# golden replay (tools/record_ocr_golden.py fixtures). Stub-contract
# fixtures (engine_kind="stub", committed in-repo) replay in THIS image;
# real-engine fixtures replay wherever the engine exists.
# ---------------------------------------------------------------------------
def _load_golden(name):
    f = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(f):
        pytest.skip(f"no recorded golden fixture {name}")
    data = np.load(f, allow_pickle=True)
    kind = str(data["engine_kind"]) if "engine_kind" in data else "real"
    return data, kind


def test_tesseract_golden_replay(monkeypatch):
    """The backend must reproduce the recorded engine outputs for the
    shipped strips, byte-for-byte — any change to the get_labels pipeline
    (PIL conversion, empty->EMPTY_CHAR, normalization, length caps) fails
    replay. Stub fixtures replay against `ocr/stub_engines.py`; a
    real-engine fixture requires tesserocr."""
    data, kind = _load_golden("tesseract.npz")
    if kind == "stub":
        mod = _install_stub_tesserocr(monkeypatch)
    else:
        if importlib.util.find_spec("tesserocr") is None:
            pytest.skip("fixture was recorded on a real tesserocr")
        import qea_ocr_tpu.ocr.tesseract as mod
    try:
        be = mod.TesseractBackend(num_threads=4)
        labels = be.get_labels(data["images"])
        assert labels == [str(x) for x in data["labels"]]
    finally:
        if kind == "stub":
            sys.modules.pop("tesserocr", None)
            importlib.reload(mod)


def test_easyocr_golden_replay(monkeypatch):
    data, kind = _load_golden("easyocr.npz")
    if kind == "stub":
        monkeypatch.setitem(sys.modules, "easyocr", make_stub_easyocr())
        import qea_ocr_tpu.ocr.easyocr_backend as mod
        importlib.reload(mod)
    else:
        if importlib.util.find_spec("easyocr") is None:
            pytest.skip("fixture was recorded on a real easyocr")
        import qea_ocr_tpu.ocr.easyocr_backend as mod
    try:
        be = mod.EasyOcrBackend()
        labels = be.get_labels(data["images"])
        assert labels == [str(x) for x in data["labels"]]
    finally:
        if kind == "stub":
            sys.modules.pop("easyocr", None)
            importlib.reload(mod)


# ---------------------------------------------------------------------------
# recorder hardening (tools/record_ocr_golden.py): schema validation +
# real-engine probing
# ---------------------------------------------------------------------------
def test_committed_fixtures_pass_schema_validation():
    from qea_ocr_tpu.tools.record_ocr_golden import validate_fixture
    found = 0
    for name in ("tesseract.npz", "easyocr.npz"):
        f = os.path.join(FIXTURE_DIR, name)
        if os.path.exists(f):
            rec = validate_fixture(f)      # raises on drift
            assert rec["engine_kind"] in ("stub", "real")
            found += 1
    assert found, "no committed golden fixtures"


def test_validate_fixture_fails_loudly_on_drift(tmp_path):
    from qea_ocr_tpu.tools.record_ocr_golden import validate_fixture
    bad = tmp_path / "tesseract.npz"
    np.savez_compressed(bad, images=np.zeros((3, 8, 8), np.float32))
    with pytest.raises(ValueError, match="missing keys"):
        validate_fixture(str(bad))
    bad2 = tmp_path / "t2.npz"
    np.savez_compressed(
        bad2, images=np.zeros((3, 8, 8), np.float32),
        labels=np.asarray(["a"] * 3), gt_texts=np.asarray(["a"] * 3),
        engine_kind=np.asarray("stub"))
    with pytest.raises(ValueError, match="images must be"):
        validate_fixture(str(bad2))


def test_recorder_probe_refuses_without_real_engine(tmp_path, monkeypatch):
    """One-command upgrade path: with no real engine installed the recorder
    must fail loudly, not silently re-record stub fixtures as 'real'."""
    from qea_ocr_tpu.tools import record_ocr_golden as rec
    if any(rec.engine_available(e) for e in ("Tesseract", "EasyOCR")):
        pytest.skip("a real engine exists here; probe would succeed")
    monkeypatch.setattr(sys, "argv",
                        ["record_ocr_golden", "--out_dir", str(tmp_path)])
    with pytest.raises(SystemExit, match="no real engine"):
        rec.main()
    assert not list(tmp_path.iterdir())


def test_recorder_stub_rerecord_matches_committed(tmp_path, monkeypatch):
    """--stub re-records into a fresh dir; output must match the committed
    stub-contract fixture byte-for-byte (labels + images)."""
    from qea_ocr_tpu.tools import record_ocr_golden as rec
    committed = os.path.join(FIXTURE_DIR, "tesseract.npz")
    if not os.path.exists(committed):
        pytest.skip("no committed tesseract fixture")
    monkeypatch.setattr(sys, "argv",
                        ["record_ocr_golden", "--engine", "Tesseract",
                         "--stub", "--out_dir", str(tmp_path)])
    try:
        rec.main()
    finally:
        sys.modules.pop("tesserocr", None)
        sys.modules.pop("easyocr", None)
        import qea_ocr_tpu.ocr.tesseract as tmod
        import qea_ocr_tpu.ocr.easyocr_backend as emod
        importlib.reload(tmod)
        importlib.reload(emod)
    new = rec.validate_fixture(str(tmp_path / "tesseract.npz"))
    old = rec.validate_fixture(committed)
    assert [str(x) for x in new["labels"]] == [str(x) for x in old["labels"]]
    np.testing.assert_array_equal(new["images"], old["images"])
    assert old["engine_kind"] == "stub"
