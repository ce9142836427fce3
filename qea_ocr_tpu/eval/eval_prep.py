"""Preprocessor evaluation: OCR accuracy/CER on cleaned images.

Counterpart of reference `eval_prep.py:15-205`:
  * patch path (`eval_patch`, :110-175): per document — extract strips from
    the cleaned output, OCR them, exact-match% + avg CER vs GT; optional
    baseline on the original strips (`--show_orig`); wildreceipt strips
    spaces from OCR output (:128-129,147-148);
  * area path (`eval_area`, :70-108): batch OCR on cleaned word crops.

TPU redesign: documents batch through one jitted prep+gather forward; CER
aggregation runs on device; the reference's `--dataset pos` dispatch bug
(README said pos, code KeyErrors — SURVEY.md §2b) is fixed by accepting both.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qea_ocr_tpu import config as C
from qea_ocr_tpu.data.datasets import ImgDataset, PatchDocuments, SyntheticWordDataset
from qea_ocr_tpu.data.pipeline import (
    batch_iterator, collate_docs, collate_words, pad_docbatch)
from qea_ocr_tpu.models import UNet
from qea_ocr_tpu.ocr.base import get_ocr_helper
from qea_ocr_tpu.ocr.engine import OcrQueryEngine
from qea_ocr_tpu.ops.edit_distance import compare_labels_device
from qea_ocr_tpu.ops.text_stack import get_text_stack_batch
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.charmap import CharMap
from qea_ocr_tpu.utils.io import load_checkpoint


@dataclasses.dataclass
class EvalPrepConfig:
    prep_path: str = C.__dict__.get("prep_model_path", "./outputs/prep_trained_model/")
    dataset: str = "patch_dataset"      # patch_dataset | vgg | pos | wildreceipt | synthetic*
    ocr: str = "Tesseract"
    batch_size: int = 64
    data_base_path: str = "."
    show_orig: bool = False
    show_txt: bool = False
    show_img: bool = False
    # architecture + synthetic knobs
    unet_features: int = 32
    batch_docs: int = 2
    max_strips: int = 32
    doc_size: tuple = C.DOC_SIZE
    synthetic_docs: int = 8
    synthetic_size: int = 64
    synthetic_strips_per_doc: int = 8   # strips rendered per synthetic doc
                                        # (match the training world)
    corruption: Optional[dict] = None
    random_seed: int = 42


class EvalPrep:
    def __init__(self, cfg: EvalPrepConfig):
        self.cfg = cfg
        self.charmap = CharMap.default()
        backend = get_ocr_helper(cfg.ocr, is_eval=True)
        if backend is None:
            raise ValueError(f"unknown OCR backend {cfg.ocr!r}")
        self.ocr = OcrQueryEngine(backend, self.charmap)

        from qea_ocr_tpu.utils.platform import default_mxu_packed
        self.prep_model = UNet(init_features=cfg.unet_features,
                               mxu_packed=default_mxu_packed())
        is_patch = cfg.dataset in ("patch_dataset", "wildreceipt", "synthetic_patch")
        init_shape = cfg.doc_size if is_patch else C.INPUT_SIZE
        variables = self.prep_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, *init_shape)), train=False)
        state = ModelState.create(variables, adam_l2(1e-4))
        self.prep_state = load_checkpoint(cfg.prep_path, state)

        if cfg.dataset == "synthetic_patch":
            self.dataset = PatchDocuments.synthetic(
                cfg.synthetic_docs, seed=cfg.random_seed,
                n_strips=cfg.synthetic_strips_per_doc,
                max_strips=cfg.max_strips, corruption=cfg.corruption,
                doc_size=cfg.doc_size)
        elif cfg.dataset == "synthetic_area":
            self.dataset = SyntheticWordDataset(
                cfg.synthetic_size, seed=cfg.random_seed,
                corruption=cfg.corruption)
        elif is_patch:
            split = C.PATCH_TEST if cfg.dataset == "patch_dataset" else C.WR_TEST
            self.dataset = PatchDocuments(
                os.path.join(cfg.data_base_path, split),
                max_strips=cfg.max_strips, doc_size=cfg.doc_size)
        else:
            split = C.VGG_TEXT_TEST if cfg.dataset == "vgg" else C.POS_TEXT_TEST
            self.dataset = ImgDataset(os.path.join(cfg.data_base_path, split))

        self._compare = jax.jit(compare_labels_device)

        @jax.jit
        def prep_strips(state, images, bboxes):
            doc_out = self.prep_model.apply(state.variables, images, train=False)
            strips = get_text_stack_batch(doc_out, bboxes)
            return doc_out, strips

        @jax.jit
        def prep_fwd(state, images):
            return self.prep_model.apply(state.variables, images, train=False)

        self._prep_strips = prep_strips
        self._prep_fwd = prep_fwd

    # ------------------------------------------------------------------
    def _postprocess(self, texts):
        if self.cfg.dataset == "wildreceipt":
            return [t.replace(" ", "") for t in texts]
        return texts

    def _ocr_encoded(self, images: np.ndarray):
        res = self.ocr.query(images)
        texts = self._postprocess(res.texts)
        return self.charmap.encode([self.charmap.clean(t) for t in texts]), texts

    def eval_patch(self):
        cfg = self.cfg
        D, S = cfg.batch_docs, cfg.max_strips
        L = self.charmap.max_len
        prd_crt = prd_cer = ori_crt = ori_cer = 0.0
        lbl_count = 0
        for batch in batch_iterator(self.dataset, D, collate_docs,
                                    shuffle=False, drop_last=False):
            if batch.images.shape[0] != D:
                # pad the tail with mask-zero docs (static jit shapes) so
                # every document is scored, as the reference's per-doc
                # iteration does (`eval_prep.py:110-175`)
                batch = pad_docbatch(batch, D)
            images = jnp.asarray(batch.images)
            bboxes = jnp.asarray(batch.bboxes)
            N = D * S
            rows = np.nonzero(batch.strip_mask.reshape(N))[0]
            gt = jnp.asarray(batch.gt_labels.reshape(N, L))
            gt_len = jnp.asarray(batch.gt_lengths.reshape(N))
            mask = jnp.asarray(batch.strip_mask.reshape(N))

            if cfg.show_orig:
                orig_strips = get_text_stack_batch(images, bboxes)
                arr = np.asarray(orig_strips).reshape(N, 1, 32, 128)[rows]
                (labs, lens), _ = self._ocr_encoded(arr)
                o_labels = np.full((N, L), self.charmap.pad_id, np.int32)
                o_lengths = np.zeros((N,), np.int32)
                o_labels[rows], o_lengths[rows] = labs, lens
                crt, cer, _ = self._compare(
                    jnp.asarray(o_labels), jnp.asarray(o_lengths), gt, gt_len, mask)
                ori_crt += float(crt); ori_cer += float(cer)

            doc_out, strips = self._prep_strips(self.prep_state, images, bboxes)
            arr = np.asarray(strips).reshape(N, 1, 32, 128)[rows]
            (labs, lens), texts = self._ocr_encoded(arr)
            if cfg.show_img:
                # headless replacement for the reference's interactive
                # show_img: save cleaned docs + strips as grids
                from qea_ocr_tpu.utils.io import save_image_grid
                os.makedirs("eval_out", exist_ok=True)
                save_image_grid(np.asarray(doc_out),
                                f"eval_out/cleaned_docs_{lbl_count}.png", nrow=2)
                save_image_grid(arr, f"eval_out/cleaned_strips_{lbl_count}.png")
            p_labels = np.full((N, L), self.charmap.pad_id, np.int32)
            p_lengths = np.zeros((N,), np.int32)
            p_labels[rows], p_lengths[rows] = labs, lens
            crt, cer, _ = self._compare(
                jnp.asarray(p_labels), jnp.asarray(p_lengths), gt, gt_len, mask)
            prd_crt += float(crt); prd_cer += float(cer)
            lbl_count += len(rows)
            if cfg.show_txt:
                gts = self.charmap.decode(batch.gt_labels.reshape(N, L)[rows],
                                          batch.gt_lengths.reshape(N)[rows])
                for g, p in zip(gts, texts):
                    print(f"{g!r} -> {p!r}")

        lc = max(1, lbl_count)
        print(f"Correct count from predicted images: {int(prd_crt)}/{lbl_count} "
              f"({prd_crt / lc:.5f})")
        if cfg.show_orig:
            print(f"Correct count from original images: {int(ori_crt)}/{lbl_count} "
                  f"({ori_crt / lc:.5f})")
            print(f"Average CER from original images: ({ori_cer / lc:.5f})")
        print(f"Average CER from predicted images: ({prd_cer / lc:.5f})")
        return prd_crt / lc, prd_cer / lc

    def eval_area(self):
        cfg = self.cfg
        crt_sum = cer_sum = ori_crt = ori_cer = 0.0
        count = 0
        for batch in batch_iterator(
                self.dataset, cfg.batch_size,
                partial(collate_words, charmap=self.charmap),
                shuffle=False, drop_last=False):
            images = jnp.asarray(batch.images)
            img_out = self._prep_fwd(self.prep_state, images)
            (labs, lens), _ = self._ocr_encoded(np.asarray(img_out))
            if cfg.show_img and count == 0:
                from qea_ocr_tpu.utils.io import save_image_grid
                os.makedirs("eval_out", exist_ok=True)
                save_image_grid(np.asarray(img_out), "eval_out/cleaned_crops.png")
            gt = jnp.asarray(batch.labels)
            gt_len = jnp.asarray(batch.lengths)
            crt, cer, _ = self._compare(
                jnp.asarray(labs), jnp.asarray(lens), gt, gt_len, None)
            crt_sum += float(crt); cer_sum += float(cer)
            if cfg.show_orig:
                (olabs, olens), _ = self._ocr_encoded(batch.images)
                crt, cer, _ = self._compare(
                    jnp.asarray(olabs), jnp.asarray(olens), gt, gt_len, None)
                ori_crt += float(crt); ori_cer += float(cer)
            count += images.shape[0]
        n = max(1, count)
        print(f"Correct count from predicted images: {int(crt_sum)}/{count} "
              f"({crt_sum / n:.5f})")
        if cfg.show_orig:
            print(f"Correct count from original images: {int(ori_crt)}/{count} "
                  f"({ori_crt / n:.5f})")
            print(f"Average CER from original images: {ori_cer / n:.5f}")
        print(f"Average CER from predicted images: {cer_sum / n:.5f}")
        return crt_sum / n, cer_sum / n

    def eval(self):
        if self.cfg.dataset in ("patch_dataset", "wildreceipt", "synthetic_patch"):
            return self.eval_patch()
        return self.eval_area()
