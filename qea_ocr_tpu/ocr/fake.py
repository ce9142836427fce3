"""Deterministic "black-box" OCR for hermetic tests and benchmarks.

The reference test strategy has no fake backend beyond GVision's canned-JSON
replay (`ocr_helper/gcloud_helper.py:114-117`). This backend is a real
image->string function: it segments glyph cells by ink columns and
nearest-template-matches them against the synthetic 5x7 font
(`qea_ocr_tpu.data.synth`). Its accuracy genuinely degrades under the
corruption model, so query budgets, CER-guided selection, and label-history
tracking are all exercisable without Tesseract.
"""

from __future__ import annotations

import numpy as np

from qea_ocr_tpu.data.synth import (
    ADVANCE,
    CHAR_H,
    CHAR_W,
    glyph_templates,
)
from qea_ocr_tpu.ocr.base import OcrBackend


class FakeOcrBackend(OcrBackend):
    """Template-matching OCR over the synthetic bitmap font."""

    def __init__(self, ink_threshold: float = 0.5, min_ink: float = 0.05,
                 match_threshold: float = 0.35, **kwargs):
        super().__init__(**kwargs)
        self.ink_threshold = ink_threshold
        self.min_ink = min_ink
        self.match_threshold = match_threshold
        tmpl = glyph_templates()
        # Drop space from the matching dictionary (it is segmentation, not a glyph).
        self._chars = [c for c in tmpl if c != " "]
        self._templates = np.stack([tmpl[c] for c in self._chars])  # (K, H, W)

    @staticmethod
    def _otsu_threshold(img: np.ndarray) -> float:
        """Otsu's method on a 64-bin histogram — the binarization real
        engines (e.g. Tesseract) apply, so low-contrast-but-structured text
        stays recognizable while noise still degrades accuracy gracefully."""
        hist, edges = np.histogram(img, bins=64, range=(0.0, 1.0))
        hist = hist.astype(np.float64)
        total = hist.sum()
        if total <= 0:
            return 0.5
        centers = 0.5 * (edges[:-1] + edges[1:])
        w0 = np.cumsum(hist)
        w1 = total - w0
        mu0 = np.cumsum(hist * centers) / np.maximum(w0, 1e-9)
        mu_t = (hist * centers).sum() / total
        mu1 = (mu_t * total - np.cumsum(hist * centers)) / np.maximum(w1, 1e-9)
        between = w0 * w1 * (mu0 - mu1) ** 2
        return float(centers[int(np.argmax(between))])

    def _recognize(self, image: np.ndarray) -> str:
        img = np.asarray(image, np.float32)
        # Otsu binarization (real engines binarize before recognition);
        # noise near the threshold flips pixels, giving graceful accuracy
        # degradation under corruption.
        if float(img.max()) - float(img.min()) < 1e-3:
            return ""
        thr = self._otsu_threshold(img)
        ink = (img < thr).astype(np.float32)
        h, w = ink.shape
        col_ink = ink.mean(axis=0)
        if col_ink.max() < self.min_ink:
            return ""
        # Locate the text band vertically: strongest CHAR_H-row window.
        row_ink = ink.mean(axis=1)
        if h > CHAR_H:
            cum = np.concatenate([[0.0], np.cumsum(row_ink)])
            windows = cum[CHAR_H:] - cum[:-CHAR_H]
            y0 = int(np.argmax(windows))
        else:
            y0 = 0
        band = ink[y0:y0 + CHAR_H, :]
        # Locate the first glyph column: first column with meaningful ink,
        # then search a few alignment offsets (glyphs like '1' have leading
        # blank columns) and keep the decode with the best template fit.
        has_ink = band.mean(axis=0) > self.min_ink
        if not has_ink.any():
            return ""
        x_first = int(np.argmax(has_ink))
        best_text, best_score = "", np.inf
        for dx in range(-(ADVANCE - CHAR_W) - 2, 3):
            x0 = x_first + dx
            if x0 < 0:
                continue
            text, score = self._decode_from(band, x0, w)
            if score < best_score:
                best_text, best_score = text, score
        return best_text.strip()

    def _decode_from(self, band: np.ndarray, x: int, w: int) -> tuple[str, float]:
        out: list[str] = []
        diffs_acc: list[float] = []
        space_run = 0
        while x + CHAR_W <= w:
            cell = band[:, x:x + CHAR_W]
            if cell.mean() < self.min_ink:
                space_run += 1
                # A single empty cell inside text is a rendered space; a long
                # run means the line ended.
                if space_run > 3:
                    break
                if out and space_run == 1:
                    out.append(" ")
                x += ADVANCE
                continue
            space_run = 0
            diffs = np.mean(
                np.abs(self._templates - (cell > self.ink_threshold)), axis=(1, 2)
            )
            best = int(np.argmin(diffs))
            diffs_acc.append(float(diffs[best]))
            if diffs[best] <= self.match_threshold:
                out.append(self._chars[best])
            x += ADVANCE
        score = float(np.mean(diffs_acc)) if diffs_acc else np.inf
        return "".join(out), score
