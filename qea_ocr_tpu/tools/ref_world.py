"""Write the synthetic world to disk in the REFERENCE's on-disk formats.

The rebuild's synthetic world normally lives in memory
(`PatchDocuments.synthetic`, `SyntheticWordDataset`). The reference can
only read datasets from disk:

  * documents: `<split>/<folder>/<img>.png` + `<img>.json` bbox/label
    sidecars in either the min/max or the 4-corner schema
    (`datasets/patch_dataset.py:62-104`);
  * word crops: `<split>/<folder>/{idx}_{LABEL}_{src}.png` with the GT
    label embedded in the filename (`datasets/img_dataset.py:38`).

This writer replays the EXACT generation streams the in-memory datasets
use (same `np.random.default_rng(seed)` consumption order), so a
`PatchDocuments.synthetic(n, seed=s, ...)` world and the tree written by
`write_patch_split(out, n, seed=s, ...)` contain the same documents up to
uint8 PNG quantization, with IDENTICAL strip names
(`"{j}_{label}_synth_doc_%05d"`) — the key invariant that lets seed-CER
JSONs, tracked-label histories, and budget ledgers be compared name-by-
name between the rebuild and a verbatim reference run
(`benchmarks/reference_verbatim.py`).

Sidecar schemas alternate per document (even index: min/max, odd:
4-corner) so one tree exercises both reference loaders.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

# reference split directory names (`properties.py:12-14,2-4`)
PATCH_TRAIN = "patch_dataset_train"
PATCH_DEV = "patch_dataset_dev"
PATCH_TEST = "patch_dataset_test"
WORD_TRAIN = "textarea_dataset_train"
WORD_DEV = "textarea_dataset_dev"
VGG_TRAIN = "vgg_train"            # the area trainer's split names
VGG_DEV = "vgg_dev"                # (`properties.py:7-9`)
VGG_TEST = "vgg_test"


def _save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image
    arr = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path, "PNG")


def _four_corner(e: dict) -> dict:
    """Lossless min/max -> 4-corner conversion (the reference reduces the
    corners straight back to min/max, `patch_dataset.py:73-83`)."""
    return dict(
        label=e["label"],
        x1=e["x_min"], y1=e["y_min"], x2=e["x_max"], y2=e["y_min"],
        x3=e["x_max"], y3=e["y_max"], x4=e["x_min"], y4=e["y_max"],
    )


def write_patch_split(
    split_dir: str,
    num_docs: int,
    seed: int,
    n_strips: int = 8,
    corruption: dict | None = None,
    doc_size: Tuple[int, int] = (400, 512),
    folder: str = "synth",
    alternate_schema: bool = True,
) -> List[str]:
    """Write one split; generation stream identical to
    `PatchDocuments.synthetic(num_docs, seed, n_strips, ...)`."""
    from qea_ocr_tpu.data.synth import make_document

    out = os.path.join(split_dir, folder)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    corruption = corruption if corruption is not None else dict(
        noise_std=0.15, shading=0.2, salt_pepper=0.01)
    paths = []
    for d in range(num_docs):
        img, entries = make_document(
            rng, doc_size[0], doc_size[1], n_strips, corruption)
        png = os.path.join(out, f"doc_{d:05d}.png")
        _save_png(png, img)
        if alternate_schema and d % 2 == 1:
            sidecar = [_four_corner(e) for e in entries]
        else:
            sidecar = [dict(label=e["label"], x_min=e["x_min"],
                            y_min=e["y_min"], x_max=e["x_max"],
                            y_max=e["y_max"]) for e in entries]
        with open(png[:-4] + ".json", "w") as f:
            json.dump(sidecar, f)
        paths.append(png)
    return paths


def write_patch_world(
    base_dir: str,
    num_train: int,
    num_val: int,
    seed: int = 42,
    n_strips: int = 8,
    corruption: dict | None = None,
    doc_size: Tuple[int, int] = (400, 512),
) -> str:
    """Train + dev splits with the PATCH trainer's seeding convention
    (train: `seed`, val: `seed + 1` — `train/patch_trainer.py:188-196`)."""
    write_patch_split(os.path.join(base_dir, PATCH_TRAIN), num_train, seed,
                      n_strips, corruption, doc_size)
    write_patch_split(os.path.join(base_dir, PATCH_DEV), num_val, seed + 1,
                      n_strips, corruption, doc_size)
    return base_dir


def write_word_split(
    split_dir: str,
    num_samples: int,
    seed: int,
    corruption: dict | None = None,
    folder: str = "crops",
) -> List[str]:
    """Word crops named `{idx}_{LABEL}_synth.png`; generation stream
    identical to `SyntheticWordDataset(num_samples, seed, ...)`. Crops
    whose label contains '/' or '_' are SKIPPED — unrepresentable in the
    filename-label format (the reference's own loader splits the name on
    '_', `img_dataset.py:38`, and '/' is a path separator)."""
    from qea_ocr_tpu.data.synth import make_word_crop

    out = os.path.join(split_dir, folder)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    corruption = corruption or dict(noise_std=0.15, shading=0.2,
                                    salt_pepper=0.01)
    paths = []
    for i in range(num_samples):
        img, label = make_word_crop(rng, None, 32, 128, corruption=corruption)
        if "/" in label or "_" in label:
            # unrepresentable in the filename-label format; ImgDataset
            # would split the name wrongly (`img_dataset.py:38`)
            continue
        png = os.path.join(out, f"{i}_{label}_synth.png")
        _save_png(png, img)
        paths.append(png)
    return paths


def write_word_world(
    base_dir: str,
    num_train: int,
    num_val: int,
    seed: int = 42,
    corruption: dict | None = None,
) -> str:
    write_word_split(os.path.join(base_dir, WORD_TRAIN), num_train, seed,
                     corruption)
    write_word_split(os.path.join(base_dir, WORD_DEV), num_val, seed + 1,
                     corruption)
    return base_dir
