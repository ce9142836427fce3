"""Dataset layer: word-crop and document-patch datasets.

Counterparts of reference `datasets/` (ImgDataset, OCRDataset, PatchDataset)
re-designed for fixed-shape TPU batching:

  * samples carry **pre-encoded** int32 labels + stable integer strip ids,
    assigned once at dataset construction (the reference re-derives string
    keys `"{j}_{label}_{folder}_{file}"` every step,
    `train_nn_patch.py:247-249` — we keep that string as the JSON-facing
    name, but device code only sees ids);
  * PatchDocuments pads/validates bboxes at load time into `(max_strips, 4)`
    arrays + masks so the whole document batch jits;
  * a `synthetic` constructor generates the in-memory bitmap-font world for
    hermetic runs (the reference has no such path).

File-format parity:
  * word crops: GT label parsed from `idx_LABEL_src.png` filenames
    (`datasets/img_dataset.py:38`), known-bad unicode files excluded;
  * documents: `<img>.json` sidecars in either 4-corner or min/max schema
    (`datasets/patch_dataset.py:62-104`), bbox filter label<=max_char_len,
    w<128, h<32, white pad to (400, 512), dummy strip when none survive.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from qea_ocr_tpu.config import DOC_SIZE, EMPTY_CHAR, INPUT_SIZE, MAX_CHAR_LEN
from qea_ocr_tpu.utils.charmap import CharMap, get_ununicode

_EXCLUDE_FILES = {
    "22_✔_786.png", "162_✓_467.png", "26_✓_receipt_00627.png",
    "61_✓_145.png", "19__V_receipt_00188.png",
}


def find_images(data_dir: str, exts=("png", "jpg", "jpeg"),
                exclude: set | None = None) -> List[str]:
    out = []
    exclude = exclude or set()
    for root, _, files in os.walk(data_dir):
        for f in sorted(files):
            if f in exclude:
                continue
            if f.lower().endswith(tuple("." + e for e in exts)):
                out.append(os.path.join(root, f))
    return out


def load_gray(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("L")
    return np.asarray(img, np.float32) / 255.0


def pad_white(img: np.ndarray, h: int, w: int,
              return_geometry: bool = False):
    """Center-pad to (h, w) with white; aspect-preserving shrink when larger
    (reference PadWhite / PatchDataset padding semantics). With
    `return_geometry`, also returns (top, left, content_h, content_w) so the
    content region can be cropped back out (serving path)."""
    from PIL import Image
    ih, iw = img.shape
    if ih > h or iw > w:
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        pil.thumbnail((w, h))
        img = np.asarray(pil, np.float32) / 255.0
        ih, iw = img.shape
    top = (h - ih) // 2
    left = (w - iw) // 2
    out = np.ones((h, w), np.float32)
    out[top:top + ih, left:left + iw] = img
    if return_geometry:
        return out, (top, left, ih, iw)
    return out


# ===========================================================================
# Word-crop datasets (area / CRNN-warmup path)
# ===========================================================================
@dataclasses.dataclass
class WordSample:
    image: np.ndarray          # (H, W) float32
    label: str                 # GT text (or OCR text for OCRDataset)
    name: str                  # strip name (file basename)
    strip_id: int


class ImgDataset:
    """Word crops with GT labels in the filename (`idx_LABEL_src.png`)."""

    def __init__(
        self,
        data_dir: str,
        input_size: Tuple[int, int] = INPUT_SIZE,
        num_subset: Optional[int] = None,
        charmap: CharMap | None = None,
    ):
        self.input_size = input_size
        self.charmap = charmap or CharMap.default()
        files = find_images(data_dir, ("png", "jpg"), _EXCLUDE_FILES)

        def _label_ok(path: str) -> bool:
            parts = os.path.basename(path).split("_")
            return len(parts) > 1 and len(parts[1]) <= MAX_CHAR_LEN

        self.files = [f for f in files if _label_ok(f)]
        if num_subset:
            self.files = self.files[:num_subset]
        self.names = [os.path.basename(f) for f in self.files]
        self.name_to_id = {n: i for i, n in enumerate(self.names)}

    def __len__(self) -> int:
        return len(self.files)

    def label_of(self, idx: int) -> str:
        label = os.path.basename(self.files[idx]).split("_")[1]
        label = get_ununicode(label)
        if len(label) > MAX_CHAR_LEN:
            label = EMPTY_CHAR
        return label

    def __getitem__(self, idx: int) -> WordSample:
        img = pad_white(load_gray(self.files[idx]), *self.input_size)
        return WordSample(img, self.label_of(idx), self.names[idx], idx)


class OCRDataset:
    """Word crops whose labels come from a black-box OCR at access time
    (reference `datasets/ocr_dataset.py`: the CRNN-warmup "learn the OCR"
    path). The OCR sees the *transformed* (possibly noisy) image."""

    def __init__(self, base: ImgDataset, ocr_helper, noise_fn=None):
        self.base = base
        self.ocr = ocr_helper
        self.noise_fn = noise_fn
        self.names = base.names
        self.name_to_id = base.name_to_id

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx: int) -> WordSample:
        s = self.base[idx]
        img = s.image
        if self.noise_fn is not None:
            img = self.noise_fn(img)
        label = self.ocr.get_labels(img[None])[0]
        return WordSample(img, label, s.name, s.strip_id)


class SyntheticWordDataset:
    """In-memory bitmap-font word crops (hermetic ImgDataset stand-in)."""

    def __init__(
        self,
        num_samples: int,
        seed: int = 0,
        corruption: dict | None = None,
        input_size: Tuple[int, int] = INPUT_SIZE,
        charmap: CharMap | None = None,
    ):
        from qea_ocr_tpu.data.synth import make_word_crop
        rng = np.random.default_rng(seed)
        self.charmap = charmap or CharMap.default()
        self.samples: List[WordSample] = []
        corruption = corruption or dict(noise_std=0.15, shading=0.2, salt_pepper=0.01)
        for i in range(num_samples):
            img, label = make_word_crop(rng, None, *input_size, corruption=corruption)
            name = f"{i}_{label}_synth.png"
            self.samples.append(WordSample(img, label, name, i))
        self.names = [s.name for s in self.samples]
        self.name_to_id = {n: i for i, n in enumerate(self.names)}

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> WordSample:
        return self.samples[idx]


# ===========================================================================
# Document-patch dataset
# ===========================================================================
@dataclasses.dataclass
class DocSample:
    image: np.ndarray          # (doc_h, doc_w) float32
    bboxes: np.ndarray         # (max_strips, 4) int32 [x_min,y_min,x_max,y_max]
    strip_mask: np.ndarray     # (max_strips,) bool
    gt_labels: np.ndarray      # (max_strips, L) int32
    gt_lengths: np.ndarray     # (max_strips,) int32
    strip_ids: np.ndarray      # (max_strips,) int32 global ids
    strip_names: List[str]     # reference-format names for JSON side-state
    doc_name: str


def _parse_sidecar(json_path: str, top_pad: int, left_pad: int,
                   resize_w: float, resize_h: float,
                   doc_size: tuple = None) -> List[dict]:
    """Parse a bbox sidecar in either reference schema, apply padding offsets
    and the strip filter (label<=max_char_len, w<128, h<32); inject a dummy
    full-white strip when nothing survives (parity with
    `datasets/patch_dataset.py:95-102`). Boxes are clamped into the document
    once here so downstream strip-gather implementations (XLA take-clamping
    vs the Pallas shift-matmul kernel) see identical in-bounds coordinates
    for malformed sidecars."""
    with open(json_path) as f:
        raw = json.load(f)
    out = []
    for i, area in enumerate(raw):
        label = area["label"]
        if raw and "x1" in raw[0]:
            xs = [area[k] + left_pad for k in ("x1", "x2", "x3", "x4")]
            ys = [area[k] + top_pad for k in ("y1", "y2", "y3", "y4")]
            x_min, x_max = int(min(xs) * resize_w), int(max(xs) * resize_w)
            y_min, y_max = int(min(ys) * resize_h), int(max(ys) * resize_h)
        else:
            x_min = area["x_min"] + left_pad
            y_min = area["y_min"] + top_pad
            x_max = area["x_max"] + left_pad
            y_max = area["y_max"] + top_pad
        # Strip filter on the RAW (pre-clamp) box dims: the reference
        # filters before any bounds handling (`patch_dataset.py:95-102`),
        # so an out-of-bounds oversize box must be DROPPED — clamping it
        # into eligibility would change the strip set, strip ids, and the
        # per-document query budget. The clamp below only normalizes
        # coordinates for pixel-gather parity between implementations.
        if not (len(label) <= MAX_CHAR_LEN and x_max - x_min < INPUT_SIZE[1]
                and y_max - y_min < INPUT_SIZE[0]):
            continue
        if doc_size is not None:
            H, W = doc_size
            x_min = max(0, min(x_min, W - 1))
            y_min = max(0, min(y_min, H - 1))
            x_max = max(x_min + 1, min(x_max, W))
            y_max = max(y_min + 1, min(y_max, H))
        out.append(dict(label=label, x_min=x_min, y_min=y_min,
                        x_max=x_max, y_max=y_max, index=i))
    if not out:
        out.append(dict(label=EMPTY_CHAR, x_min=0, y_min=0,
                        x_max=INPUT_SIZE[1] - 1, y_max=INPUT_SIZE[0] - 1, index=0))
    return out


class PatchDocuments:
    """Documents + bbox sidecars, fixed-shape per-document arrays.

    Strip ids are globally unique across the dataset; `strip_names` keep the
    reference `"{j}_{label}_{folder}_{file}"` format so CER-seed JSONs from
    the reference pipeline (`cer_data_utils/`) index directly.
    """

    def __init__(
        self,
        data_dir: Optional[str] = None,
        *,
        doc_size: Tuple[int, int] = DOC_SIZE,
        max_strips: int = 64,
        resize_images: bool = False,
        num_subset: Optional[int] = None,
        charmap: CharMap | None = None,
        documents: Optional[List[Tuple[np.ndarray, List[dict], str]]] = None,
    ):
        self.doc_size = doc_size
        self.max_strips = max_strips
        self.charmap = charmap or CharMap.default()
        self.samples: List[DocSample] = []
        self.name_to_id: Dict[str, int] = {}
        self.id_to_name: Dict[int, str] = {}

        if documents is not None:
            items = documents
        else:
            files = find_images(data_dir)
            if num_subset:
                files = files[:num_subset]
            items = []
            for path in files:
                img = load_gray(path)
                h, w = img.shape
                top_pad = left_pad = 0
                resize_w = resize_h = 1.0
                if h <= doc_size[0] or w <= doc_size[1]:
                    dh, dw = doc_size[0] - h, doc_size[1] - w
                    top_pad, left_pad = dh // 2, dw // 2
                    canvas = np.ones(doc_size, np.float32)
                    canvas[top_pad:top_pad + h, left_pad:left_pad + w] = img
                    img = canvas
                elif resize_images:
                    from PIL import Image
                    pil = Image.fromarray((img * 255).astype(np.uint8)).resize(
                        (doc_size[1], doc_size[0]))
                    resize_h = doc_size[0] / h
                    resize_w = doc_size[1] / w
                    img = np.asarray(pil, np.float32) / 255.0
                entries = _parse_sidecar(
                    path.rsplit(".", 1)[0] + ".json",
                    top_pad, left_pad, resize_w, resize_h,
                    doc_size=(img.shape[0], img.shape[1]))
                items.append((img, entries, path))

        next_id = 0
        for img, entries, path in items:
            entries = entries[: self.max_strips]
            folder = os.path.basename(os.path.dirname(path)) or "doc"
            fname = os.path.splitext(os.path.basename(path))[0]
            S = self.max_strips
            bboxes = np.zeros((S, 4), np.int32)
            bboxes[:, 2:] = 1  # degenerate-but-valid dummy boxes
            mask = np.zeros((S,), bool)
            labels = np.full((S, self.charmap.max_len), self.charmap.pad_id, np.int32)
            lengths = np.zeros((S,), np.int32)
            ids = np.zeros((S,), np.int32)
            names = []
            for j, e in enumerate(entries):
                bboxes[j] = (e["x_min"], e["y_min"], e["x_max"], e["y_max"])
                mask[j] = True
                enc, ln = self.charmap.encode([self.charmap.clean(e["label"])])
                labels[j], lengths[j] = enc[0], ln[0]
                name = f"{j}_{e['label']}_{folder}_{fname}"
                names.append(name)
                self.name_to_id[name] = next_id
                self.id_to_name[next_id] = name
                ids[j] = next_id
                next_id += 1
            self.samples.append(DocSample(
                img.astype(np.float32), bboxes, mask, labels, lengths, ids,
                names, os.path.join(folder, fname)))
        self.num_strips = next_id

    @classmethod
    def synthetic(
        cls,
        num_docs: int,
        seed: int = 0,
        n_strips: int = 8,
        max_strips: int = 16,
        corruption: dict | None = None,
        doc_size: Tuple[int, int] = DOC_SIZE,
    ) -> "PatchDocuments":
        from qea_ocr_tpu.data.synth import make_document
        rng = np.random.default_rng(seed)
        corruption = corruption if corruption is not None else dict(
            noise_std=0.15, shading=0.2, salt_pepper=0.01)
        docs = []
        for d in range(num_docs):
            img, entries = make_document(
                rng, doc_size[0], doc_size[1], n_strips, corruption)
            for i, e in enumerate(entries):
                e["index"] = i
            docs.append((img, entries, f"synth/doc_{d:05d}.png"))
        return cls(documents=docs, max_strips=max_strips, doc_size=doc_size)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> DocSample:
        return self.samples[idx]
