"""CRNN warmup trainer: supervised CTC training of the proxy alone.

Counterpart of reference `train_crnn.py:28-214` ("learn the OCR's outputs"):
labels come from a black-box OCR on the (noisy) training crops when an OCR
is configured, else from GT filenames; clean validation with greedy-decode
accuracy; StepLR(step=10, gamma=0.8); best + final checkpoints.

TPU-first structure: one jitted train step (CTC-mean loss, batch-stats
update, non-finite-gradient scrubbing — the functional replacement for the
reference's NaN backward hook, `model_crnn.py:30-32`) and one jitted eval
step (decode + device CER). The black-box boundary is the host OCR call per
batch; everything else stays on device.
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
from qea_ocr_tpu.data.datasets import ImgDataset, SyntheticWordDataset
from qea_ocr_tpu.data.pipeline import (
    WordBatch, batch_iterator, collate_words, default_num_workers)
from qea_ocr_tpu.models import CRNN
from qea_ocr_tpu.ocr.base import get_ocr_helper
from qea_ocr_tpu.ocr.engine import OcrQueryEngine
from qea_ocr_tpu.ops.ctc import ctc_loss_mean, greedy_decode
from qea_ocr_tpu.ops.edit_distance import compare_labels_device
from qea_ocr_tpu.train.state import ModelState, adam_l2, set_learning_rate, step_lr
from qea_ocr_tpu.utils.charmap import CharMap
from qea_ocr_tpu.utils.io import save_checkpoint
from qea_ocr_tpu.utils.metrics import MetricsLogger, StepTimer


@dataclasses.dataclass
class CrnnTrainerConfig:
    batch_size: int = 32
    lr: float = 1e-4
    epochs: int = 50
    std: int = 5
    random_std: bool = True
    random_seed: int = 42
    ocr: Optional[str] = None          # None -> GT labels from filenames
    dataset: str = "pos"               # pos | vgg | synthetic
    data_base_path: str = "."
    train_subset: Optional[int] = None
    val_subset: Optional[int] = None
    crnn_model_path: str = "./outputs/crnn_trained_model/model"
    ckpt_path: Optional[str] = None    # resume checkpoint
    start_epoch: int = -1
    decay: float = 0.8
    decay_step: int = 10
    # architecture overrides (tests use small models)
    lstm_hidden: int = 256
    # synthetic-world knobs
    synthetic_train_size: int = 256
    synthetic_val_size: int = 64
    corruption: Optional[dict] = None
    log_dir: Optional[str] = None


def scrub_nonfinite(tree):
    """Zero non-finite gradients (parity with the reference NaN hook)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), tree
    )


class TrainCRNN:
    def __init__(self, cfg: CrnnTrainerConfig):
        self.cfg = cfg
        self.charmap = CharMap.default()
        np.random.seed(cfg.random_seed)
        self._np_rng = np.random.default_rng(cfg.random_seed)

        # ----------------------------------------------------------- data
        if cfg.dataset == "synthetic":
            corruption = cfg.corruption
            self.train_ds = SyntheticWordDataset(
                cfg.synthetic_train_size, seed=cfg.random_seed,
                corruption=corruption)
            self.val_ds = SyntheticWordDataset(
                cfg.synthetic_val_size, seed=cfg.random_seed + 1,
                corruption=corruption)
        else:
            split = {
                "pos": (C.POS_TEXT_TRAIN, C.POS_TEXT_DEV),
                "vgg": (C.VGG_TEXT_TRAIN, C.VGG_TEXT_DEV),
            }[cfg.dataset]
            self.train_ds = ImgDataset(
                os.path.join(cfg.data_base_path, split[0]),
                num_subset=cfg.train_subset)
            self.val_ds = ImgDataset(
                os.path.join(cfg.data_base_path, split[1]),
                num_subset=cfg.val_subset)

        backend = get_ocr_helper(cfg.ocr)
        self.ocr = OcrQueryEngine(backend, self.charmap) if backend else None

        # ----------------------------------------------------------- model
        self.model = CRNN(vocab_size=self.charmap.vocab_size,
                          lstm_hidden=cfg.lstm_hidden)
        key = jax.random.PRNGKey(cfg.random_seed)
        variables = self.model.init(
            key, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False)
        tx = adam_l2(cfg.lr, weight_decay=0.0)
        self.state = ModelState.create(variables, tx)
        if cfg.ckpt_path:
            from qea_ocr_tpu.utils.io import load_checkpoint
            self.state = load_checkpoint(cfg.ckpt_path, self.state)

        self.logger = MetricsLogger(cfg.log_dir)
        self.timer = StepTimer()
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, cm = self.model, self.charmap

        @jax.jit
        def train_step(state: ModelState, images, labels, lengths):
            def loss_fn(params):
                scores, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"],
                )
                loss = ctc_loss_mean(scores, labels, lengths, pad_id=cm.pad_id)
                return loss, updates["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = scrub_nonfinite(grads)
            new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
            return new_state, loss

        @jax.jit
        def eval_step(state: ModelState, images, labels, lengths):
            scores = model.apply(state.variables, images, train=False)
            loss = ctc_loss_mean(scores, labels, lengths, pad_id=cm.pad_id)
            dec, dec_len = greedy_decode(scores, pad_id=cm.pad_id)
            crt, cer_sum, _ = compare_labels_device(
                dec[:, : cm.max_len], jnp.minimum(dec_len, cm.max_len),
                labels, lengths)
            return loss, crt, cer_sum, dec, dec_len

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------
    def _noise(self, images: np.ndarray) -> np.ndarray:
        """Host-side gaussian jitter (the OCR must see the same noisy image
        the model trains on, so noise is applied before the black-box call).
        Semantics parity with `AddGaussianNoice` (`transform_helper.py:33-45`).
        """
        cfg = self.cfg
        B = images.shape[0]
        if cfg.random_std:
            stds = self._np_rng.integers(0, cfg.std + 1, B) / 100.0
        else:
            stds = np.full(B, cfg.std / 100.0)
        noise = self._np_rng.normal(
            0.0, 1.0, images.shape).astype(np.float32)
        noise *= stds.reshape(B, *([1] * (images.ndim - 1))).astype(np.float32)
        return np.clip(images - noise, 0.0, 1.0)

    def _labels_for(self, batch: WordBatch, images: np.ndarray):
        """OCR-on-noisy labels when an OCR is configured, else GT."""
        if self.ocr is None:
            return batch.labels, batch.lengths
        res = self.ocr.query(images)
        return res.labels, res.lengths

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        best_val_acc, best_val_epoch = 0.0, 0
        for epoch in range(cfg.start_epoch + 1, cfg.epochs):
            self.state = set_learning_rate(
                self.state, step_lr(cfg.lr, epoch, cfg.decay_step, cfg.decay))
            training_loss, steps = 0.0, 0
            for batch in batch_iterator(
                    self.train_ds, cfg.batch_size,
                    partial(collate_words, charmap=self.charmap),
                    seed=cfg.random_seed, epoch=epoch,
                    num_workers=default_num_workers(), prefetch=2):
                with self.timer.time("noise"):
                    noisy = self._noise(batch.images)
                with self.timer.time("ocr"):
                    labels, lengths = self._labels_for(batch, noisy)
                with self.timer.time("device_step"):
                    self.state, loss = self._train_step(
                        self.state, jnp.asarray(noisy),
                        jnp.asarray(labels), jnp.asarray(lengths))
                training_loss += float(loss)
                steps += 1

            val_loss, crt, cer_sum, n_val = self._validate()
            val_acc = crt / max(1, n_val)
            metrics = {
                "Epoch": epoch + 1,
                "train_loss": training_loss / max(1, steps),
                "val_loss": val_loss,
                "CRNN_accuracy": val_acc,
                "CRNN_CER": cer_sum / max(1, n_val),
                "lr": step_lr(cfg.lr, epoch, cfg.decay_step, cfg.decay),
            }
            if self.ocr:
                metrics["Total Black-Box Calls"] = self.ocr.total_calls
            self.logger.log(metrics)

            if val_acc > best_val_acc:
                best_val_acc, best_val_epoch = val_acc, epoch
                self._save(epoch, val_acc)
            if epoch + 1 == cfg.epochs:
                self._save(epoch, val_acc)
        return best_val_acc, best_val_epoch

    def _validate(self):
        total_loss, crt_total, cer_total, n = 0.0, 0.0, 0.0, 0
        nb = 0
        for batch in batch_iterator(
                self.val_ds, self.cfg.batch_size,
                partial(collate_words, charmap=self.charmap),
                shuffle=False, drop_last=False):
            labels, lengths = batch.labels, batch.lengths
            if self.ocr is not None:
                res = self.ocr.query(batch.images)
                labels, lengths = res.labels, res.lengths
            loss, crt, cer_sum, _, _ = self._eval_step(
                self.state, jnp.asarray(batch.images),
                jnp.asarray(labels), jnp.asarray(lengths))
            total_loss += float(loss)
            crt_total += float(crt)
            cer_total += float(cer_sum)
            n += batch.images.shape[0]
            nb += 1
        return total_loss / max(1, nb), crt_total, cer_total, n

    def _save(self, epoch: int, acc: float):
        path = f"{self.cfg.crnn_model_path}_{epoch}_{acc * 100:.2f}"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_checkpoint(path, self.state)
