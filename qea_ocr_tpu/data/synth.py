"""Synthetic text rendering + corrupted-document generation.

The reference has no hermetic test path at all (SURVEY.md §4): its trainers
can only be exercised against real Tesseract/EasyOCR/GVision on real POS/VGG
datasets. This module provides the framework's deterministic test-and-bench
world:

  * a 5x7 bitmap font renderer producing (32, 128) text strips and full
    (400, 512) documents with bbox sidecar metadata — same geometry as the
    POS patch dataset (`datasets/patch_dataset.py:21`, `properties.py:33`);
  * parameterized corruptions (gaussian noise, background shading, salt &
    pepper) so a preprocessor has real work to do;
  * the glyph templates double as the matching dictionary for
    `qea_ocr_tpu.ocr.fake.FakeOcrBackend`, a deterministic "black-box" OCR
    whose accuracy genuinely degrades with corruption — making query budgets,
    label tracking, and CER-guided selection all testable end-to-end.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

# ----------------------------------------------------------------- 5x7 font
# Rows are 5-char strings; '#' = ink. Uppercase-only alphabet + digits +
# common receipt punctuation.
_GLYPHS: Dict[str, Tuple[str, ...]] = {
    "A": (" ### ", "#   #", "#   #", "#####", "#   #", "#   #", "#   #"),
    "B": ("#### ", "#   #", "#   #", "#### ", "#   #", "#   #", "#### "),
    "C": (" ### ", "#   #", "#    ", "#    ", "#    ", "#   #", " ### "),
    "D": ("#### ", "#   #", "#   #", "#   #", "#   #", "#   #", "#### "),
    "E": ("#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#####"),
    "F": ("#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#    "),
    "G": (" ### ", "#   #", "#    ", "# ###", "#   #", "#   #", " ### "),
    "H": ("#   #", "#   #", "#   #", "#####", "#   #", "#   #", "#   #"),
    "I": (" ### ", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "),
    "J": ("  ###", "   # ", "   # ", "   # ", "   # ", "#  # ", " ##  "),
    "K": ("#   #", "#  # ", "# #  ", "##   ", "# #  ", "#  # ", "#   #"),
    "L": ("#    ", "#    ", "#    ", "#    ", "#    ", "#    ", "#####"),
    "M": ("#   #", "## ##", "# # #", "# # #", "#   #", "#   #", "#   #"),
    "N": ("#   #", "##  #", "# # #", "#  ##", "#   #", "#   #", "#   #"),
    "O": (" ### ", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "),
    "P": ("#### ", "#   #", "#   #", "#### ", "#    ", "#    ", "#    "),
    "Q": (" ### ", "#   #", "#   #", "#   #", "# # #", "#  # ", " ## #"),
    "R": ("#### ", "#   #", "#   #", "#### ", "# #  ", "#  # ", "#   #"),
    "S": (" ####", "#    ", "#    ", " ### ", "    #", "    #", "#### "),
    "T": ("#####", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", "  #  "),
    "U": ("#   #", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "),
    "V": ("#   #", "#   #", "#   #", "#   #", "#   #", " # # ", "  #  "),
    "W": ("#   #", "#   #", "#   #", "# # #", "# # #", "## ##", "#   #"),
    "X": ("#   #", "#   #", " # # ", "  #  ", " # # ", "#   #", "#   #"),
    "Y": ("#   #", "#   #", " # # ", "  #  ", "  #  ", "  #  ", "  #  "),
    "Z": ("#####", "    #", "   # ", "  #  ", " #   ", "#    ", "#####"),
    "0": (" ### ", "#   #", "#  ##", "# # #", "##  #", "#   #", " ### "),
    "1": ("  #  ", " ##  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "),
    "2": (" ### ", "#   #", "    #", "   # ", "  #  ", " #   ", "#####"),
    "3": (" ### ", "#   #", "    #", "  ## ", "    #", "#   #", " ### "),
    "4": ("   # ", "  ## ", " # # ", "#  # ", "#####", "   # ", "   # "),
    "5": ("#####", "#    ", "#### ", "    #", "    #", "#   #", " ### "),
    "6": (" ### ", "#    ", "#    ", "#### ", "#   #", "#   #", " ### "),
    "7": ("#####", "    #", "   # ", "  #  ", " #   ", " #   ", " #   "),
    "8": (" ### ", "#   #", "#   #", " ### ", "#   #", "#   #", " ### "),
    "9": (" ### ", "#   #", "#   #", " ####", "    #", "    #", " ### "),
    ".": ("     ", "     ", "     ", "     ", "     ", " ##  ", " ##  "),
    ",": ("     ", "     ", "     ", "     ", " ##  ", "  #  ", " #   "),
    "-": ("     ", "     ", "     ", "#####", "     ", "     ", "     "),
    ":": ("     ", " ##  ", " ##  ", "     ", " ##  ", " ##  ", "     "),
    "/": ("    #", "    #", "   # ", "  #  ", " #   ", "#    ", "#    "),
    "$": ("  #  ", " ####", "# #  ", " ### ", "  # #", "#### ", "  #  "),
    "%": ("##  #", "## # ", "  #  ", "  #  ", " #   ", "# ## ", "#  ##"),
    "&": (" ##  ", "#  # ", "#  # ", " ##  ", "# # #", "#  # ", " ## #"),
    "'": (" ##  ", "  #  ", " #   ", "     ", "     ", "     ", "     "),
    "(": ("   # ", "  #  ", " #   ", " #   ", " #   ", "  #  ", "   # "),
    ")": (" #   ", "  #  ", "   # ", "   # ", "   # ", "  #  ", " #   "),
    "+": ("     ", "  #  ", "  #  ", "#####", "  #  ", "  #  ", "     "),
    "=": ("     ", "     ", "#####", "     ", "#####", "     ", "     "),
    " ": ("     ", "     ", "     ", "     ", "     ", "     ", "     "),
}

GLYPH_H, GLYPH_W = 7, 5
SCALE = 2
CHAR_H, CHAR_W = GLYPH_H * SCALE, GLYPH_W * SCALE   # 14 x 10
ADVANCE = CHAR_W + SCALE                             # 12 px per char
FONT_CHARS = "".join(sorted(_GLYPHS.keys()))


@lru_cache(maxsize=1)
def glyph_templates() -> Dict[str, np.ndarray]:
    """char -> (CHAR_H, CHAR_W) float ink mask (1 = ink)."""
    out = {}
    for ch, rows in _GLYPHS.items():
        g = np.array([[1.0 if c == "#" else 0.0 for c in row] for row in rows],
                     dtype=np.float32)
        out[ch] = np.kron(g, np.ones((SCALE, SCALE), np.float32))
    return out


def renderable(text: str) -> str:
    """Project text onto the synthetic font's alphabet (uppercased)."""
    return "".join(c for c in text.upper() if c in _GLYPHS)


def render_text_strip(
    text: str, h: int = 32, w: int = 128, ink: float = 0.0
) -> np.ndarray:
    """Render text centered into an (h, w) white strip. Text that does not
    fit is truncated. Returns float32 in [0, 1]."""
    text = renderable(text)
    max_chars = max(1, (w - 2) // ADVANCE)
    text = text[:max_chars]
    canvas = np.ones((h, w), dtype=np.float32)
    tw = len(text) * ADVANCE - (ADVANCE - CHAR_W) if text else 0
    x = max(0, (w - tw) // 2)
    y = max(0, (h - CHAR_H) // 2)
    tmpl = glyph_templates()
    for ch in text:
        if x + CHAR_W > w:
            break
        patch = tmpl[ch]
        region = canvas[y:y + CHAR_H, x:x + CHAR_W]
        canvas[y:y + CHAR_H, x:x + CHAR_W] = np.where(patch > 0, ink, region)
        x += ADVANCE
    return canvas


def corrupt(
    rng: np.random.Generator,
    image: np.ndarray,
    noise_std: float = 0.25,
    shading: float = 0.35,
    salt_pepper: float = 0.02,
) -> np.ndarray:
    """Degrade a document so the preprocessor has denoising work to do."""
    h, w = image.shape
    out = image.copy()
    if shading > 0:
        gx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
        gy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
        phase = rng.uniform(0, 2 * np.pi)
        grad = 0.5 + 0.5 * np.sin(2 * np.pi * (gx * rng.uniform(0.5, 2.0)
                                               + gy * rng.uniform(0.5, 2.0)) + phase)
        out = out * (1.0 - shading * grad)
    if noise_std > 0:
        out = out + rng.normal(0, noise_std, size=out.shape).astype(np.float32)
    if salt_pepper > 0:
        mask = rng.random(out.shape)
        out = np.where(mask < salt_pepper / 2, 0.0, out)
        out = np.where(mask > 1 - salt_pepper / 2, 1.0, out)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


_WORDS = (
    "TOTAL CASH CHANGE RECEIPT ITEM PRICE QTY TAX SUBTOTAL DATE TIME STORE "
    "THANK YOU VISIT AGAIN CARD AMOUNT PAID BALANCE DUE INVOICE NO REF "
    "MILK BREAD COFFEE SUGAR RICE 1.50 23.99 100 42 7% $5.00 12:30 01/02"
).split()


def random_label(rng: np.random.Generator, max_words: int = 2) -> str:
    n = int(rng.integers(1, max_words + 1))
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def make_document(
    rng: np.random.Generator,
    doc_h: int = 400,
    doc_w: int = 512,
    n_strips: int = 8,
    corruption: dict | None = None,
) -> Tuple[np.ndarray, List[dict]]:
    """Generate one corrupted document + bbox/label sidecar entries.

    Sidecar entries use the reference min/max bbox schema
    (`datasets/patch_dataset.py:84-88`): {label, x_min, y_min, x_max, y_max}.
    Strip boxes satisfy the dataset filter (w<128, h<32).
    """
    clean = np.ones((doc_h, doc_w), dtype=np.float32)
    entries: List[dict] = []
    rows = max(1, n_strips)
    row_h = doc_h // rows
    for r in range(rows):
        label = random_label(rng)
        label = renderable(label)[:10]
        if not label:
            label = "ITEM"
        sw = min(127, len(label) * ADVANCE + 4)
        sh = CHAR_H + 4  # 18 < 32
        x0 = int(rng.integers(2, max(3, doc_w - sw - 2)))
        y0 = r * row_h + int(rng.integers(0, max(1, row_h - sh)))
        y0 = min(y0, doc_h - sh - 1)
        strip = render_text_strip(label, sh, sw)
        clean[y0:y0 + sh, x0:x0 + sw] = strip
        entries.append({
            "label": label,
            "x_min": x0, "y_min": y0, "x_max": x0 + sw, "y_max": y0 + sh,
        })
    corruption = corruption or {}
    dirty = corrupt(rng, clean, **corruption)
    return dirty, entries


def make_word_crop(
    rng: np.random.Generator,
    label: str | None = None,
    h: int = 32,
    w: int = 128,
    corruption: dict | None = None,
) -> Tuple[np.ndarray, str]:
    """One corrupted (h, w) word crop + its GT label (area-dataset analogue)."""
    if label is None:
        label = renderable(random_label(rng))[:10] or "ITEM"
    img = render_text_strip(label, h, w)
    corruption = corruption if corruption is not None else {}
    img = corrupt(rng, img, **corruption)
    return img, label
