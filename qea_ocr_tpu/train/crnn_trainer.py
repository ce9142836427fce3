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

Scaling (TPU-native; the reference's only multi-GPU artifact is a dormant
`nn.DataParallel`, `model_crnn.py:11-12`): `data_parallel=True` replicates
the model/optimizer state over a 1-D `data` mesh and shards the crop batch
on the word axis — XLA partitions the same jitted steps and inserts the
gradient psum. Multi-process: `batch_size` is the GLOBAL batch, crops are
pinned per host, each host OCRs only its own rows.
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
    # TPU-native additions
    data_parallel: bool = False  # shard the crop batch over all devices
                                 # (GSPMD 1-D `data` mesh, state replicated;
                                 # multi-process: batch pinned per host)


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

        # Optional GSPMD data parallelism (see module docstring).
        self.mesh = None
        if cfg.data_parallel:
            from qea_ocr_tpu.parallel import make_mesh, put_replicated
            self.mesh = make_mesh()
            n_dev = len(self.mesh.devices.flat)
            if cfg.batch_size % n_dev:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must be a multiple of the "
                    f"device count {n_dev} for data_parallel mode")
            self.state = put_replicated(self.state, self.mesh)
        self._pc = jax.process_count() if self.mesh is not None else 1
        self._pi = jax.process_index() if self.mesh is not None else 0
        if self._pc > 1 and cfg.batch_size % self._pc:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be a multiple of the "
                f"process count {self._pc}")
        self._bl = cfg.batch_size // self._pc  # local crops per step
        from qea_ocr_tpu.parallel import pinned_subset
        self._local_train_indices = pinned_subset(
            np.arange(len(self.train_ds)), self._pi, self._pc)

        self.logger = MetricsLogger(cfg.log_dir if self._pi == 0 else None)
        self.timer = StepTimer()
        self._build_steps()

    # ------------------------------------------------------------------
    def _dev(self, x):
        """Batch-array device placement: plain `jnp.asarray` under one
        process, global-array assembly from local rows under many."""
        if self._pc == 1:
            return jnp.asarray(x)
        from qea_ocr_tpu.parallel import global_from_local
        return global_from_local(x, self.mesh)

    def _put_images(self, images: np.ndarray):
        """Crop-batch placement: explicitly `P(data)`-sharded under a mesh
        (multi-host-safe), plain device array otherwise."""
        if self.mesh is None:
            return jnp.asarray(images)
        from qea_ocr_tpu.parallel import put_batch_global
        return put_batch_global(images, self.mesh)

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
        def eval_step(state: ModelState, images, labels, lengths, mask):
            """`mask` excludes padding rows (tail batches are padded to the
            compiled shape so every val sample is scored — and, under DP,
            so the sharded batch keeps its static shape)."""
            scores = model.apply(state.variables, images, train=False)
            loss = ctc_loss_mean(scores, labels, lengths, pad_id=cm.pad_id,
                                 sample_mask=mask)
            dec, dec_len = greedy_decode(scores, pad_id=cm.pad_id)
            crt, cer_sum, _ = compare_labels_device(
                dec[:, : cm.max_len], jnp.minimum(dec_len, cm.max_len),
                labels, lengths, mask)
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
                    self.train_ds, self._bl,
                    partial(collate_words, charmap=self.charmap),
                    seed=cfg.random_seed, epoch=epoch,
                    indices=self._local_train_indices,
                    num_workers=default_num_workers(), prefetch=2):
                with self.timer.time("noise"):
                    noisy = self._noise(batch.images)
                with self.timer.time("ocr"):
                    # each host OCRs only its own pinned rows; the global
                    # batch is assembled from the per-host label shards
                    labels, lengths = self._labels_for(batch, noisy)
                with self.timer.time("device_step"):
                    self.state, loss = self._train_step(
                        self.state, self._put_images(noisy),
                        self._dev(labels), self._dev(lengths))
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
        """Score EVERY val sample: tail batches are padded to the compiled
        shape and masked (same deliberate deviation as the area trainer —
        the reference's val loader drops the tail yet divides by the full
        set size, `train_crnn.py:162-199`). Multi-process: each global
        window of B crops is split into per-host slices; empty slices feed
        an all-padding batch so the jitted lockstep holds, and metrics come
        out of GLOBAL masked reductions (identical on every host)."""
        from qea_ocr_tpu.data.pipeline import blank_wordbatch, pad_wordbatch
        B = self.cfg.batch_size
        agg = dict(loss=0.0, crt=0.0, cer=0.0)
        n = 0
        if self._pc == 1:
            for batch in batch_iterator(
                    self.val_ds, B,
                    partial(collate_words, charmap=self.charmap),
                    shuffle=False, drop_last=False):
                real = batch.images.shape[0]
                batch = pad_wordbatch(batch, B)
                mask = np.arange(B) < real
                n += self._validate_batch(batch, mask, agg)
        else:
            Bl = self._bl
            collate = partial(collate_words, charmap=self.charmap)
            template = None
            for start in range(0, len(self.val_ds), B):
                window = np.arange(start, min(start + B, len(self.val_ds)))
                local_idx = window[self._pi * Bl:(self._pi + 1) * Bl]
                samples = [self.val_ds[int(i)] for i in local_idx]
                if samples:
                    batch = pad_wordbatch(collate(samples), Bl)
                    template = batch
                else:
                    if template is None:
                        template = pad_wordbatch(
                            collate([self.val_ds[0]]), Bl)
                    batch = blank_wordbatch(template, Bl)
                mask = np.arange(Bl) < len(samples)
                n += self._validate_batch(batch, mask, agg)
        return agg["loss"] / max(1, n), agg["crt"], agg["cer"], n

    def _validate_batch(self, batch, mask, agg) -> int:
        """Score one (local) window slice into `agg`; returns the GLOBAL
        real-sample count. OCR (when configured) sees only this host's
        real rows, keeping the black-box query count exact."""
        real = int(mask.sum())
        Bl = len(mask)
        labels, lengths = batch.labels, batch.lengths
        if self.ocr is not None:
            width = labels.shape[1]
            ocr_labels = np.zeros((Bl, width), np.int32)
            ocr_lengths = np.zeros((Bl,), np.int32)
            if real:
                res = self.ocr.query(batch.images[:real])
                w = min(width, res.labels.shape[1])
                ocr_labels[:real, :w] = res.labels[:, :w]
                ocr_lengths[:real] = np.minimum(res.lengths, width)
            labels, lengths = ocr_labels, ocr_lengths
        mask_dev = self._dev(mask)
        loss, crt, cer_sum, _, _ = self._eval_step(
            self.state, self._put_images(batch.images),
            self._dev(labels), self._dev(lengths), mask_dev)
        real_global = int(jnp.sum(mask_dev))
        # masked-mean loss x real recovers the per-sample sum so padded
        # tail windows carry proportional weight in the epoch average
        agg["loss"] += float(loss) * real_global
        agg["crt"] += float(crt)
        agg["cer"] += float(cer_sum)
        return real_global

    def _save(self, epoch: int, acc: float):
        path = f"{self.cfg.crnn_model_path}_{epoch}_{acc * 100:.2f}"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_checkpoint(path, self.state)
