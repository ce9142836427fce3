"""CER-seed generation: run the black-box OCR over a training split and emit
the `{strip_name: cer}` JSON consumed by `--cers_ocr_path`.

Counterpart of reference `cer_data_utils/ocr_inference_patch_dataset.py`
(patch variant: keys `{j}_{label}_{folder}_{file}`) and
`cer_data_utils/ocr_inference.py` (textarea variant: word-crop file names).
CER computation runs through the native batch edit-distance
(`qea_ocr_tpu.utils.native`), OCR through the async engine.

CLI: python -m qea_ocr_tpu.tools.cer_seed --mode patch --data_base_path ... \
       --ocr Fake --out cers.json
"""

from __future__ import annotations

import argparse
import json
from typing import Dict

import numpy as np

from qea_ocr_tpu.ocr.base import get_ocr_helper
from qea_ocr_tpu.ocr.engine import OcrQueryEngine
from qea_ocr_tpu.utils import native
from qea_ocr_tpu.utils.charmap import CharMap


def cer_of_batch(ocr_texts, gt_texts, charmap: CharMap) -> np.ndarray:
    p, pl = charmap.encode([charmap.clean(t) for t in ocr_texts])
    g, gl = charmap.encode([charmap.clean(t) for t in gt_texts])
    d = native.batch_levenshtein(p, pl, g, gl)
    return d / np.maximum(gl, 1)


def seed_patch(dataset, engine: OcrQueryEngine,
               charmap: CharMap) -> Dict[str, float]:
    """Per-strip initial CERs for a PatchDocuments dataset."""
    import jax.numpy as jnp
    from qea_ocr_tpu.ops.text_stack import get_text_stack
    out: Dict[str, float] = {}
    for sample in dataset.samples:
        rows = np.nonzero(sample.strip_mask)[0]
        strips = np.asarray(get_text_stack(
            jnp.asarray(sample.image), jnp.asarray(sample.bboxes[rows])))
        res = engine.query(strips)
        gts = charmap.decode(sample.gt_labels[rows], sample.gt_lengths[rows])
        cers = cer_of_batch(res.texts, gts, charmap)
        for k, r in enumerate(rows):
            out[sample.strip_names[r]] = float(cers[k])
    return out


def seed_area(dataset, engine: OcrQueryEngine,
              charmap: CharMap, batch: int = 64) -> Dict[str, float]:
    """Per-crop initial CERs for a word-crop dataset."""
    out: Dict[str, float] = {}
    n = len(dataset)
    for start in range(0, n, batch):
        samples = [dataset[i] for i in range(start, min(n, start + batch))]
        imgs = np.stack([s.image for s in samples])
        res = engine.query(imgs)
        gts = [s.label for s in samples]
        cers = cer_of_batch(res.texts, gts, charmap)
        for s, c in zip(samples, cers):
            out[s.name] = float(c)
    return out


def main(argv=None):
    from qea_ocr_tpu.utils.platform import setup_platform
    setup_platform()
    p = argparse.ArgumentParser(description="Generate CER seed JSON")
    p.add_argument("--mode", choices=["patch", "area"], default="patch")
    p.add_argument("--dataset", default="patch",
                   help="patch | pos | vgg | synthetic")
    p.add_argument("--data_base_path", default=".")
    p.add_argument("--ocr", default="Tesseract")
    p.add_argument("--out", required=True)
    p.add_argument("--max_strips", type=int, default=32)
    p.add_argument("--num_subset", type=int)
    p.add_argument("--synthetic_size", type=int, default=32)
    # synthetic-world parameters — must match the trainer's world exactly
    # or the seed keys/values won't correspond to its strips
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--strips_per_doc", type=int, default=6)
    p.add_argument("--doc_size", type=int, nargs=2, metavar=("H", "W"))
    p.add_argument("--corruption",
                   help='JSON dict, e.g. \'{"noise_std": 0.18, ...}\'')
    args = p.parse_args(argv)

    charmap = CharMap.default()
    engine = OcrQueryEngine(get_ocr_helper(args.ocr), charmap)
    if args.mode == "patch":
        from qea_ocr_tpu import config as C
        from qea_ocr_tpu.data.datasets import PatchDocuments
        if args.dataset == "synthetic":
            ds = PatchDocuments.synthetic(
                args.synthetic_size, seed=args.seed,
                n_strips=args.strips_per_doc, max_strips=args.max_strips,
                corruption=(json.loads(args.corruption)
                            if args.corruption else None),
                **({"doc_size": tuple(args.doc_size)}
                   if args.doc_size else {}))
        else:
            import os
            ds = PatchDocuments(
                os.path.join(args.data_base_path, C.PATCH_TRAIN),
                max_strips=args.max_strips, num_subset=args.num_subset)
        cers = seed_patch(ds, engine, charmap)
    else:
        from qea_ocr_tpu import config as C
        from qea_ocr_tpu.data.datasets import ImgDataset, SyntheticWordDataset
        if args.dataset == "synthetic":
            ds = SyntheticWordDataset(
                args.synthetic_size, seed=args.seed,
                corruption=(json.loads(args.corruption)
                            if args.corruption else None))
        else:
            import os
            split = C.POS_TEXT_TRAIN if args.dataset == "pos" else C.VGG_TEXT_TRAIN
            ds = ImgDataset(os.path.join(args.data_base_path, split),
                            num_subset=args.num_subset)
        cers = seed_area(ds, engine, charmap)
    with open(args.out, "w") as f:
        json.dump(cers, f)
    print(f"wrote {len(cers)} CERs to {args.out} "
          f"(bb calls: {engine.total_calls})")


if __name__ == "__main__":
    main()
