"""Data-layer tests (file-based datasets, both bbox sidecar schemas) and
OCR subsystem tests (async engine, budget accounting, GVision mock)."""

import json

import numpy as np
import pytest
from PIL import Image

from qea_ocr_tpu.config import EMPTY_CHAR
from qea_ocr_tpu.data.datasets import ImgDataset, OCRDataset, PatchDocuments
from qea_ocr_tpu.ocr.base import get_ocr_helper
from qea_ocr_tpu.ocr.engine import OcrQueryEngine
from qea_ocr_tpu.ocr.fake import FakeOcrBackend
from qea_ocr_tpu.utils.charmap import CharMap


def _write_png(path, arr):
    Image.fromarray((arr * 255).astype(np.uint8), "L").save(path)


class TestPatchDocumentsFiles:
    def _make_doc_tree(self, tmp_path, schema="minmax"):
        d = tmp_path / "docs" / "folderA"
        d.mkdir(parents=True)
        img = np.ones((200, 300), np.float32) * 0.8
        _write_png(d / "doc1.png", img)
        if schema == "minmax":
            sidecar = [
                {"label": "HELLO", "x_min": 10, "y_min": 10,
                 "x_max": 100, "y_max": 30},
                {"label": "X" * 200, "x_min": 0, "y_min": 0,
                 "x_max": 50, "y_max": 20},         # too long -> filtered
                {"label": "WIDE", "x_min": 0, "y_min": 0,
                 "x_max": 200, "y_max": 20},        # too wide -> filtered
            ]
        else:
            sidecar = [
                {"label": "CORNERS", "x1": 10, "x2": 100, "x3": 100, "x4": 10,
                 "y1": 10, "y2": 10, "y3": 30, "y4": 30},
            ]
        (d / "doc1.json").write_text(json.dumps(sidecar))
        return str(tmp_path / "docs")

    def test_minmax_schema_padding_and_filter(self, tmp_path):
        root = self._make_doc_tree(tmp_path, "minmax")
        ds = PatchDocuments(root, max_strips=8, doc_size=(400, 512))
        assert len(ds) == 1
        s = ds[0]
        assert s.image.shape == (400, 512)
        # 200x300 image center-padded: top=(400-200)//2=100, left=106
        assert s.strip_mask.sum() == 1  # two entries filtered
        x0, y0, x1, y1 = s.bboxes[0]
        assert (x0, y0, x1, y1) == (10 + 106, 10 + 100, 100 + 106, 30 + 100)
        cm = CharMap.default()
        assert cm.decode(s.gt_labels[:1], s.gt_lengths[:1]) == ["HELLO"]
        # reference strip-name format
        assert s.strip_names[0] == "0_HELLO_folderA_doc1"

    def test_corner_schema(self, tmp_path):
        root = self._make_doc_tree(tmp_path, "corners")
        ds = PatchDocuments(root, max_strips=4, doc_size=(400, 512))
        s = ds[0]
        assert s.strip_mask.sum() == 1
        x0, y0, x1, y1 = s.bboxes[0]
        assert x1 - x0 == 90 and y1 - y0 == 20

    def test_dummy_strip_when_none_survive(self, tmp_path):
        d = tmp_path / "docs2" / "f"
        d.mkdir(parents=True)
        _write_png(d / "doc.png", np.ones((100, 100), np.float32))
        (d / "doc.json").write_text(json.dumps(
            [{"label": "TOOWIDE", "x_min": 0, "y_min": 0,
              "x_max": 300, "y_max": 60}]))
        ds = PatchDocuments(str(tmp_path / "docs2"), max_strips=4)
        s = ds[0]
        assert s.strip_mask.sum() == 1
        cm = CharMap.default()
        assert cm.decode(s.gt_labels[:1], s.gt_lengths[:1]) == [EMPTY_CHAR]

    def test_size_filter_uses_raw_dims_not_clamped(self, tmp_path):
        """An out-of-bounds OVERSIZE box must be dropped (reference filters
        on raw dims, `patch_dataset.py:95-102`) — clamping into the document
        first would shrink it into eligibility and change the strip set."""
        d = tmp_path / "docs3" / "f"
        d.mkdir(parents=True)
        _write_png(d / "doc.png", np.ones((200, 300), np.float32) * 0.8)
        (d / "doc.json").write_text(json.dumps([
            {"label": "HELLO", "x_min": 10, "y_min": 10,
             "x_max": 100, "y_max": 30},
            # after the 106px left pad: x 506..726, raw w=220 >= 128 ->
            # must be filtered; clamping to the 512-wide doc first would
            # leave w=1 and let it through.
            {"label": "OOB", "x_min": 400, "y_min": 10,
             "x_max": 620, "y_max": 30},
        ]))
        ds = PatchDocuments(str(tmp_path / "docs3"), max_strips=4,
                            doc_size=(400, 512))
        s = ds[0]
        assert s.strip_mask.sum() == 1
        cm = CharMap.default()
        assert cm.decode(s.gt_labels[:1], s.gt_lengths[:1]) == ["HELLO"]


class TestImgDataset:
    def test_filename_label_parsing(self, tmp_path):
        d = tmp_path / "crops"
        d.mkdir()
        _write_png(d / "0_TOTAL_rec1.png", np.ones((20, 60), np.float32))
        _write_png(d / "1_9.99_rec1.png", np.ones((18, 40), np.float32))
        _write_png(d / "nolabel.png", np.ones((18, 40), np.float32))
        ds = ImgDataset(str(d))
        assert len(ds) == 2  # nolabel filtered (no underscore label)
        labels = sorted(ds.label_of(i) for i in range(2))
        assert labels == ["9.99", "TOTAL"]
        s = ds[0]
        assert s.image.shape == (32, 128)  # PadWhite geometry

    def test_ocr_dataset_labels_from_backend(self, tmp_path):
        from qea_ocr_tpu.data.synth import render_text_strip
        d = tmp_path / "crops2"
        d.mkdir()
        _write_png(d / "0_CASH_rec.png", render_text_strip("CASH"))
        base = ImgDataset(str(d))
        ocr = FakeOcrBackend()
        ds = OCRDataset(base, ocr)
        s = ds[0]
        assert s.label == "CASH"       # OCR-produced, not filename
        assert ocr.count_calls == 1


class TestOcrEngine:
    def test_sync_query_tokenizes(self):
        from qea_ocr_tpu.data.synth import render_text_strip
        cm = CharMap.default()
        eng = OcrQueryEngine(FakeOcrBackend(), cm)
        imgs = np.stack([render_text_strip("TOTAL"), render_text_strip("42")])
        res = eng.query(imgs, tag="t")
        assert res.texts == ["TOTAL", "42"]
        assert cm.decode(res.labels, res.lengths) == ["TOTAL", "42"]
        assert eng.total_calls == 2 and eng.epoch_calls == 2
        eng.reset_epoch()
        assert eng.epoch_calls == 0 and eng.total_calls == 2

    def test_async_submit(self):
        from qea_ocr_tpu.data.synth import render_text_strip
        eng = OcrQueryEngine(FakeOcrBackend(), CharMap.default())
        fut = eng.submit(render_text_strip("CASH")[None], tag=7)
        res = fut.result(timeout=30)
        assert res.texts == ["CASH"] and res.tag == 7
        assert eng.total_calls == 1
        hist, edges = eng.latency_histogram()
        assert hist.sum() == 1

    def test_factory(self):
        assert get_ocr_helper("Fake") is not None
        assert get_ocr_helper(None) is None
        assert get_ocr_helper("bogus") is None


class TestGVisionMock:
    def test_mock_labels_and_fullimage(self):
        from qea_ocr_tpu.ocr.gvision import GVisionBackend
        b = GVisionBackend(mock_response=True, mock_text="HELLO")
        out = b.get_labels(np.ones((2, 32, 128), np.float32))
        assert out == ["HELLO", "HELLO"]
        words = b.get_labels_fullimage(np.ones((400, 512), np.float32))
        assert words[0][0] == "HELLO" and len(words[0][1]) == 4

    def test_charset_filter(self):
        from qea_ocr_tpu.ocr.gvision import GVisionBackend
        b = GVisionBackend(mock_response=True)
        assert b._filter_charset("ab☃c€") == "abc€"


class TestGVisionFailureCounter:
    def test_aborts_after_max_exceptions(self):
        from qea_ocr_tpu.ocr.gvision import GVisionBackend
        b = GVisionBackend(mock_response=True, max_exceptions=3)
        b.mock_response = False          # force the live path...
        b.client = None                  # ...which raises on every call
        import numpy as np
        img = np.ones((32, 128), np.float32)
        # first max_exceptions-1 failures return empty labels
        for _ in range(2):
            assert b._recognize(img) == ""
        with pytest.raises(RuntimeError, match="consecutive"):
            b._recognize(img)


class TestImageGrid:
    def test_grid_geometry(self, tmp_path):
        from qea_ocr_tpu.utils.io import save_image_grid
        imgs = np.random.default_rng(0).random((5, 1, 8, 10)).astype(np.float32)
        p = tmp_path / "grid.png"
        save_image_grid(imgs, str(p), nrow=3, pad=2)
        arr = np.asarray(Image.open(p))
        # 2 rows x 3 cols: H = 2*(8+2)+2 = 22, W = 3*(10+2)+2 = 38
        assert arr.shape == (22, 38)
