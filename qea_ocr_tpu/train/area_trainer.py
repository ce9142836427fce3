"""Budget-aware textarea (word-crop) preprocessor trainer.

Capability parity with reference `train_nn_area.py:30-413` (SURVEY.md §3.2):
the same two-phase algorithm as the patch trainer, but the dataset yields
batches of pre-cropped word images (default 64), the UNet runs directly on
(B, 1, 32, 128) crops, selection operates per minibatch, and an optional
cosine LR schedule steps per epoch (`train_nn_area.py:156-161,313-315`).

Reuses the patch phase-A step (it is text-stack-agnostic) and a dedicated
phase-B that fuses UNet fwd + CRNN(frozen BN) + CTC(GT) + MSE(white) with
the device CER/entropy table update.

Scaling (TPU-native; the reference is strictly single-device, SURVEY §5):
`data_parallel=True` replicates model/optimizer state over a 1-D `data`
mesh and shards the (B, 1, 32, 128) crop batch on the word axis — XLA
partitions the SAME jitted steps and inserts the gradient psum from the
sharding annotations. Under multiple JAX processes (pods), `batch_size` is
the GLOBAL batch: each host owns a pinned subset of the word crops
(`parallel/multihost.py`), runs the black-box OCR for its own rows only,
and the device boundary assembles global arrays. Selection/label-history
stay host-local per pinned subset (each host picks its
ceil(Bl*(1-prop)) rows — same per-host budget, queries never cross DCN).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from types import SimpleNamespace
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qea_ocr_tpu import config as C
from qea_ocr_tpu.data.datasets import ImgDataset, SyntheticWordDataset
from qea_ocr_tpu.data.pipeline import (
    batch_iterator, collate_words, default_num_workers, pad_wordbatch)
from qea_ocr_tpu.models import CRNN, HistoryAttention, UNet
from qea_ocr_tpu.ocr.base import get_ocr_helper
from qea_ocr_tpu.ocr.engine import OcrQueryEngine
from qea_ocr_tpu.ops.ctc import ctc_loss_mean, greedy_decode
from qea_ocr_tpu.ops.edit_distance import cer_from_labels, compare_labels_device
from qea_ocr_tpu.ops.entropy import mean_sequence_entropy
from qea_ocr_tpu.selection import GLOBAL_METHODS, is_global, membership_mask, select_batch
from qea_ocr_tpu.tracking import (
    LabelHistory,
    attention_weights,
    decaying_weights,
    levenshtein_weights,
    weightgenerator_factory,
)
from qea_ocr_tpu.train.crnn_trainer import scrub_nonfinite
from qea_ocr_tpu.train.patch_steps import make_steps
from qea_ocr_tpu.train.state import ModelState, adam_l2, cosine_lr, set_learning_rate
from qea_ocr_tpu.utils.charmap import CharMap
from qea_ocr_tpu.utils.io import ExpDirs, load_json, save_checkpoint, save_image_png, save_json
from qea_ocr_tpu.utils.metrics import MetricsLogger, StepTimer


@dataclasses.dataclass
class AreaTrainerConfig:
    # reference flag surface (area_cli.py:10-124)
    batch_size: int = 64
    lr_crnn: float = 1e-4
    lr_prep: float = 5e-5
    scalar: float = 1.0
    epochs: int = 25
    random_seed: int = 42
    std: int = 5
    inner_limit: int = 2
    inner_limit_skip: bool = False
    crnn_model: Optional[str] = None
    prep_model: Optional[str] = None
    exp_base_path: str = "."
    ocr: str = "Tesseract"
    dataset: str = "pos"                 # pos | vgg | synthetic
    random_std: bool = True
    minibatch_subset: Optional[str] = None
    minibatch_subset_prop: float = 0.5
    start_epoch: int = 0
    data_base_path: str = "."
    warmup_epochs: int = 0
    train_subset_size: Optional[int] = None
    val_subset_size: Optional[int] = None
    cers_ocr_path: Optional[str] = None
    update_CRNN: bool = False
    window_size: int = 1
    query_dim: int = 32
    emb_dim: int = 256
    attn_activation: str = "sigmoid"
    weightgen_method: str = "decaying"
    decay_factor: float = 0.7
    discount_factor: float = 1.0
    lr_scheduler: Optional[str] = None   # None | "cosine" (CRNN lr, reference)
    # Prep-side cosine decay. The reference stubs this out (commented
    # scheduler_prep, `train_nn_area.py:161,316`); it is the effective
    # countermeasure to late-run co-adaptation drift (the prep warping
    # glyphs the robust proxy reads but the black box does not), so it is
    # exposed as an opt-in extension here.
    lr_scheduler_prep: Optional[str] = None
    # TPU-native additions
    data_parallel: bool = False  # shard the word-crop batch over all devices
                                 # (GSPMD 1-D `data` mesh; model/opt state
                                 # replicated). Multi-process: batch_size is
                                 # the GLOBAL batch, word crops pinned per
                                 # host (see module docstring).
    prep_ema: float = 0.0     # >0: keep an exponential moving average of the
                              # prep params (decay=this value, updated after
                              # every phase-B step) and use it for validation
                              # and checkpoints. Counteracts the word-crop
                              # path's late-run co-adaptation drift (the prep
                              # warping glyphs the robust proxy reads but the
                              # black box does not, benchmarks/RESULTS.md):
                              # the EMA stays near the average of the stable
                              # early region while the raw params keep
                              # exploring. 0 disables (reference behavior).
    prep_pretrain_epochs: int = 0  # identity/denoise UNet pretraining before
                                   # the budget loop (skipped when a
                                   # --prep_model checkpoint is loaded);
                                   # same mechanism as the patch trainer
    prep_pretrain_lr: float = 1e-3
    synthetic_train_size: int = 128
    synthetic_val_size: int = 32
    corruption: Optional[dict] = None
    lstm_hidden: int = 256
    unet_features: int = 32
    use_wandb: bool = False
    optuna_trial: object = None


def make_area_steps(prep_model, crnn_model, charmap, *, sec_loss_scalar=1.0):
    pad_id = charmap.pad_id
    max_len = charmap.max_len

    @jax.jit
    def prep_forward(prep_state, images):
        out = prep_model.apply(prep_state.variables, images, train=False)
        return jax.lax.stop_gradient(out)

    @partial(jax.jit, static_argnames=("update_crnn",),
             donate_argnums=(0, 1, 4, 5))
    def phase_b(prep_state, crnn_state, images, gt_labels, cer_table,
                ent_table, gt_lengths, strip_ids, *, update_crnn: bool):
        B = images.shape[0]

        def loss_fn(prep_params, crnn_params):
            img_out, prep_updates = prep_model.apply(
                {"params": prep_params, "batch_stats": prep_state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            scores = crnn_model.apply(
                {"params": crnn_params, "batch_stats": crnn_state.batch_stats},
                img_out, train=False)
            pri = ctc_loss_mean(scores, gt_labels, gt_lengths, pad_id=pad_id)
            sec = jnp.mean((img_out - 1.0) ** 2) * sec_loss_scalar
            return pri + sec, (img_out, scores, prep_updates["batch_stats"])

        (loss, (img_out, scores, new_bs)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            prep_state.params, crnn_state.params)
        prep_grads, crnn_grads = grads
        new_prep = prep_state.apply_gradients(
            scrub_nonfinite(prep_grads)).replace(batch_stats=new_bs)
        new_crnn = (crnn_state.apply_gradients(scrub_nonfinite(crnn_grads))
                    if update_crnn else crnn_state)

        dec, dec_len = greedy_decode(scores, pad_id=pad_id)
        cers = cer_from_labels(dec[:, :max_len], jnp.minimum(dec_len, max_len),
                               gt_labels, gt_lengths)
        new_cer = cer_table.at[strip_ids].set(cers)
        new_ent = ent_table.at[strip_ids].set(mean_sequence_entropy(scores))
        return new_prep, new_crnn, img_out, dict(loss=loss, cers=cers), new_cer, new_ent

    @partial(jax.jit, donate_argnums=(0,))
    def prep_pretrain_step(prep_state, images):
        """Identity/denoise pretraining: MSE(prep(x), x) on word crops."""
        def loss_fn(params):
            out, updates = prep_model.apply(
                {"params": params, "batch_stats": prep_state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            return jnp.mean((out - images) ** 2), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(prep_state.params)
        new_state = prep_state.apply_gradients(
            scrub_nonfinite(grads)).replace(batch_stats=new_bs)
        return new_state, loss

    @jax.jit
    def val_forward(prep_state, crnn_state, images, gt_labels, gt_lengths,
                    sample_mask):
        """Validation fwd. `sample_mask` excludes `pad_wordbatch` padding
        rows from the loss (tail batches are padded+masked so every val
        sample is scored — deliberate fix of the reference's
        drop_last=True + /val_set_size mismatch, see _validate)."""
        img_out = prep_model.apply(prep_state.variables, images, train=False)
        scores = crnn_model.apply(crnn_state.variables, img_out, train=False)
        loss = ctc_loss_mean(scores, gt_labels, gt_lengths, pad_id=pad_id,
                             sample_mask=sample_mask)
        m = sample_mask.astype(jnp.float32)
        per_mse = jnp.mean((img_out - 1.0) ** 2, axis=(1, 2, 3))
        loss = loss + (jnp.sum(per_mse * m) / jnp.maximum(1.0, jnp.sum(m))
                       ) * sec_loss_scalar
        dec, dec_len = greedy_decode(scores, pad_id=pad_id)
        return img_out, dec, dec_len, loss

    return SimpleNamespace(prep_forward=prep_forward, phase_b=phase_b,
                           prep_pretrain_step=prep_pretrain_step,
                           val_forward=val_forward)


class TrainNNPrepArea:
    def __init__(self, cfg: AreaTrainerConfig):
        self.cfg = cfg
        self.charmap = CharMap.default()
        self.dirs = ExpDirs(cfg.exp_base_path).create()
        np.random.seed(cfg.random_seed)
        self._np_rng = np.random.default_rng(cfg.random_seed)
        self._key = jax.random.PRNGKey(cfg.random_seed)

        if cfg.dataset == "synthetic":
            self.train_ds = SyntheticWordDataset(
                cfg.synthetic_train_size, seed=cfg.random_seed,
                corruption=cfg.corruption)
            self.val_ds = SyntheticWordDataset(
                cfg.synthetic_val_size, seed=cfg.random_seed + 1,
                corruption=cfg.corruption)
        else:
            split = {"pos": (C.POS_TEXT_TRAIN, C.POS_TEXT_DEV),
                     "vgg": (C.VGG_TEXT_TRAIN, C.VGG_TEXT_DEV)}[cfg.dataset]
            self.train_ds = ImgDataset(
                os.path.join(cfg.data_base_path, split[0]),
                num_subset=cfg.train_subset_size)
            self.val_ds = ImgDataset(
                os.path.join(cfg.data_base_path, split[1]),
                num_subset=cfg.val_subset_size)

        backend = get_ocr_helper(cfg.ocr)
        if backend is None:
            raise ValueError(f"unknown OCR backend {cfg.ocr!r}")
        self.ocr = OcrQueryEngine(backend, self.charmap)

        from qea_ocr_tpu.utils.platform import default_mxu_packed
        # conv_impl pinned to "xla" like patch_trainer's GRAD path: this
        # UNet runs under value_and_grad every step, and the Pallas cmajor
        # kernel neither supports the 32x128 word-crop geometry nor should
        # a process-wide QEA_CONV_IMPL=cmajor reach a grad program (its
        # backward is the measured-OOM path; see patch_trainer).
        self.prep_model = UNet(init_features=cfg.unet_features,
                               mxu_packed=default_mxu_packed(),
                               conv_impl="xla")
        self.crnn_model = CRNN(vocab_size=self.charmap.vocab_size,
                               lstm_hidden=cfg.lstm_hidden)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(cfg.random_seed), 3)
        prep_vars = self.prep_model.init(
            k1, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False)
        crnn_vars = self.crnn_model.init(
            k2, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False)
        # weight_decay 0: parity with `train_nn_area.py:149-154`
        self.prep_state = ModelState.create(prep_vars, adam_l2(cfg.lr_prep, 0.0))
        self.crnn_state = ModelState.create(crnn_vars, adam_l2(cfg.lr_crnn, 0.0))
        if cfg.prep_model:
            from qea_ocr_tpu.utils.io import load_checkpoint
            self.prep_state = load_checkpoint(cfg.prep_model, self.prep_state)
        if cfg.crnn_model:
            from qea_ocr_tpu.utils.io import load_checkpoint
            self.crnn_state = load_checkpoint(cfg.crnn_model, self.crnn_state)

        self.weightgen_method = weightgenerator_factory(cfg.weightgen_method)
        self.history = LabelHistory(len(self.train_ds), cfg.window_size,
                                    self.charmap)
        self.attn_model = self.attn_vars = None
        if cfg.weightgen_method == "self_attention":
            self.attn_model = HistoryAttention(
                char_vocab_size=self.charmap.vocab_size,
                emb_size=cfg.emb_dim, query_dim=cfg.query_dim,
                window_size=cfg.window_size, activation=cfg.attn_activation)
            self.attn_vars = self.attn_model.init(
                k3, jnp.zeros((1, cfg.window_size, self.charmap.max_len),
                              jnp.int32))

        n = len(self.train_ds)
        cers0 = np.ones((n,), np.float32)
        self.selected_samples: Dict[str, List[bool]] = {}
        if cfg.cers_ocr_path:
            seed = load_json(cfg.cers_ocr_path)
            for name, cer in seed.items():
                if name in self.train_ds.name_to_id:
                    cers0[self.train_ds.name_to_id[name]] = cer
                self.selected_samples[name] = [False] * cfg.epochs
        self.cer_table = jnp.asarray(cers0)
        self.ent_table = jnp.ones((n,), jnp.float32)
        self.all_cers: Dict[str, List[float]] = {}
        self.global_bitmap = np.zeros((n,), bool)

        # Optional GSPMD data parallelism: replicate states, shard batches
        # on the word axis; XLA partitions the same jitted steps and inserts
        # the gradient psum from the sharding annotations (mirrors
        # patch_trainer.py — reference `train_nn_area.py` is single-device).
        self.mesh = None
        if cfg.data_parallel:
            from qea_ocr_tpu.parallel import make_mesh, put_replicated
            self.mesh = make_mesh()
            n_dev = len(self.mesh.devices.flat)
            if cfg.batch_size % n_dev:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must be a multiple of the "
                    f"device count {n_dev} for data_parallel mode")
            self.prep_state = put_replicated(self.prep_state, self.mesh)
            self.crnn_state = put_replicated(self.crnn_state, self.mesh)
            self.cer_table = put_replicated(self.cer_table, self.mesh)
            self.ent_table = put_replicated(self.ent_table, self.mesh)

        # Multi-host topology: batch_size is the GLOBAL batch; each host
        # owns a pinned word subset, loads/OCRs only its Bl = batch_size/pc
        # rows, and the device boundary assembles global arrays.
        self._pc = jax.process_count() if self.mesh is not None else 1
        self._pi = jax.process_index() if self.mesh is not None else 0
        if self._pc > 1 and cfg.batch_size % self._pc:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be a multiple of the "
                f"process count {self._pc}")
        self._bl = cfg.batch_size // self._pc  # local words per step
        from qea_ocr_tpu.parallel import pinned_subset
        self._local_train_indices = pinned_subset(
            np.arange(len(self.train_ds)), self._pi, self._pc)

        # phase A is strip-layout agnostic — reuse the patch step factory.
        self._patch_steps = make_steps(
            self.prep_model, self.crnn_model, self.charmap,
            sec_loss_scalar=cfg.scalar)
        self.steps = make_area_steps(
            self.prep_model, self.crnn_model, self.charmap,
            sec_loss_scalar=cfg.scalar)
        self.logger = MetricsLogger(
            cfg.exp_base_path, use_wandb=cfg.use_wandb and self._pi == 0)
        self.timer = StepTimer()
        self._compare = jax.jit(compare_labels_device)
        self._last_crnn_loss = 0.0

        self.ema_params = None
        if cfg.prep_ema > 0.0:
            # deep-copy: phase_b DONATES prep_state, so aliasing its param
            # buffers here would leave the EMA pointing at deleted arrays
            self.ema_params = jax.tree_util.tree_map(
                jnp.array, self.prep_state.params)
            decay = float(cfg.prep_ema)
            self._ema_update = jax.jit(
                lambda ema, p: jax.tree_util.tree_map(
                    lambda a, b: decay * a + (1.0 - decay) * b, ema, p))

    # ------------------------------------------------------------------
    def _dev(self, x, dim: int = 0):
        """Device placement for batch-dimension arrays: plain `jnp.asarray`
        under one process (jit shards on the mesh), global-array assembly
        from this process's local rows under many (`dim` = the sharded
        dimension, e.g. 1 for (n_jitter, B, ...) stacks)."""
        if self._pc == 1:
            return jnp.asarray(x)
        from qea_ocr_tpu.parallel import (
            global_from_local, global_from_local_dim)
        if dim == 0:
            return global_from_local(x, self.mesh)
        return global_from_local_dim(x, self.mesh, dim)

    def _put_images(self, images: np.ndarray):
        """Word-crop batch placement: explicitly `P(data)`-sharded under a
        mesh (multi-host-safe), plain device array otherwise."""
        if self.mesh is None:
            return jnp.asarray(images)
        from qea_ocr_tpu.parallel import put_batch_global
        return put_batch_global(images, self.mesh)

    def _fetch_rows(self, global_array) -> np.ndarray:
        """Host copy of this process's rows of a batch-sharded device
        array (the whole array under one process)."""
        if self._pc == 1:
            return np.asarray(global_array)
        from qea_ocr_tpu.parallel import local_rows
        return local_rows(global_array)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _noise(self, images):
        cfg = self.cfg
        B = images.shape[0]
        stds = (self._np_rng.integers(0, cfg.std + 1, B) / 100.0
                if cfg.random_std else np.full(B, cfg.std / 100.0))
        noise = self._np_rng.normal(0.0, 1.0, images.shape).astype(np.float32)
        noise *= stds.reshape(B, *([1] * (images.ndim - 1))).astype(np.float32)
        return np.clip(images - noise, 0.0, 1.0)

    def _gen_weights(self, sel_ids):
        cfg = self.cfg
        if cfg.weightgen_method == "decaying":
            return decaying_weights(cfg.decay_factor, cfg.window_size)
        labs, lens, valid = self.history.gather(sel_ids)
        if cfg.weightgen_method == "levenshtein":
            return levenshtein_weights(jnp.asarray(labs), jnp.asarray(lens),
                                       jnp.asarray(valid))
        return attention_weights(self.attn_model.apply, self.attn_vars,
                                 jnp.asarray(labs), jnp.asarray(valid))

    # ------------------------------------------------------------------
    def _prep_pretrain(self):
        """Identity/denoise pretraining epochs for the UNet (patch-trainer
        mechanism on word crops)."""
        cfg = self.cfg
        self.prep_state = set_learning_rate(self.prep_state,
                                            cfg.prep_pretrain_lr)
        for epoch in range(cfg.prep_pretrain_epochs):
            total, n = 0.0, 0
            for batch in batch_iterator(
                    self.train_ds, self._bl,
                    partial(collate_words, charmap=self.charmap),
                    seed=cfg.random_seed + 7000, epoch=epoch,
                    indices=self._local_train_indices):
                self.prep_state, loss = self.steps.prep_pretrain_step(
                    self.prep_state, self._put_images(batch.images))
                total += float(loss)
                n += 1
            print(f"[prep-pretrain] epoch {epoch} mse {total / max(1, n):.5f}")
        self.prep_state = set_learning_rate(self.prep_state, cfg.lr_prep)

    def train(self):
        cfg = self.cfg
        if cfg.prep_pretrain_epochs and not cfg.prep_model:
            self._prep_pretrain()
        if self.ema_params is not None:
            # re-seed from the post-pretrain params so the average never
            # blends the untrained init (pretrain updates bypass the EMA)
            self.ema_params = jax.tree_util.tree_map(
                jnp.array, self.prep_state.params)
        B = cfg.batch_size
        L = self.charmap.max_len
        W = cfg.window_size
        n_jitter = max(0, cfg.inner_limit - (1 if cfg.inner_limit_skip else 0)) \
            if cfg.inner_limit else 0
        best_val_acc, best_val_epoch = 0.0, 0
        total_crnn_updates = 0
        total_train_bb_calls = 0

        for epoch in range(cfg.start_epoch, cfg.epochs):
            if cfg.lr_scheduler == "cosine":
                self.crnn_state = set_learning_rate(
                    self.crnn_state, cosine_lr(cfg.lr_crnn, epoch, cfg.epochs))
            if cfg.lr_scheduler_prep == "cosine":
                self.prep_state = set_learning_rate(
                    self.prep_state, cosine_lr(cfg.lr_prep, epoch, cfg.epochs))
            if is_global(cfg.minibatch_subset):
                num = max(1, int(round((1 - cfg.minibatch_subset_prop)
                                       * len(self.train_ds))))
                # dedicated per-epoch stream (not self._np_rng, whose state
                # depends on data-dependent noise draws): every process
                # derives the SAME global bitmap (patch-trainer parity)
                rng = np.random.default_rng((cfg.random_seed, 9173, epoch))
                self.global_bitmap = GLOBAL_METHODS[cfg.minibatch_subset](
                    rng, np.asarray(self.cer_table), num)
            self.ocr.reset_epoch()
            training_loss, steps = 0.0, 0
            crnn_loss_acc = 0.0
            epoch_crnn_updates = 0
            epoch_print = True
            last_img_out = None

            for batch in batch_iterator(
                    self.train_ds, self._bl,
                    partial(collate_words, charmap=self.charmap),
                    seed=cfg.random_seed, epoch=epoch,
                    indices=self._local_train_indices,
                    num_workers=default_num_workers(), prefetch=2):
                images = self._put_images(batch.images)
                img_preds = self.steps.prep_forward(self.prep_state, images)

                # ------- selection (host-LOCAL rows; see module docstring)
                Bl = self._bl
                ids = jnp.asarray(batch.strip_ids)
                valid = jnp.ones((1, Bl), bool)
                if (not cfg.minibatch_subset) or epoch < cfg.warmup_epochs:
                    bb_mask = np.ones((Bl,), bool)
                elif is_global(cfg.minibatch_subset):
                    bb_mask = np.asarray(membership_mask(
                        ids, jnp.asarray(self.global_bitmap)))
                else:
                    est_table = (self.ent_table
                                 if cfg.minibatch_subset == "uniformEntropy"
                                 else self.cer_table)
                    est = np.asarray(est_table)[batch.strip_ids]
                    m, _ = select_batch(
                        cfg.minibatch_subset, self._next_key(),
                        jnp.asarray(est)[None], valid,
                        cfg.minibatch_subset_prop)
                    bb_mask = np.asarray(m[0])
                sel_rows = np.nonzero(bb_mask)[0]
                sel_ids = batch.strip_ids[sel_rows]
                if epoch_print:
                    n_sel = len(sel_rows)
                    if self._pc > 1:
                        # global-bitmap methods select different counts per
                        # host — sum the real per-host counts (collective;
                        # every host reaches this branch in lockstep on the
                        # first batch of the epoch)
                        from qea_ocr_tpu.parallel import process_sum
                        n_sel = int(process_sum([n_sel])[0])
                    print(f"Total Samples - {B}")
                    print(f"OCR Samples - {n_sel}")
                    epoch_print = False
                for r in sel_rows:
                    self.selected_samples.setdefault(
                        batch.names[r], [False] * cfg.epochs)[epoch] = True

                # ------------- phase A --------------------------------
                if cfg.inner_limit:
                    self._phase_a(batch, img_preds, bb_mask, sel_rows,
                                  sel_ids, n_jitter, Bl, L, W)
                    total_crnn_updates += 1
                    epoch_crnn_updates += 1
                    crnn_loss_acc += self._last_crnn_loss

                # ------------- phase B --------------------------------
                (self.prep_state, self.crnn_state, img_out, metrics,
                 self.cer_table, self.ent_table) = self.steps.phase_b(
                    self.prep_state, self.crnn_state, images,
                    self._dev(batch.labels), self.cer_table, self.ent_table,
                    self._dev(batch.lengths), self._dev(batch.strip_ids),
                    update_crnn=cfg.update_CRNN)
                if self.ema_params is not None:
                    self.ema_params = self._ema_update(
                        self.ema_params, self.prep_state.params)
                training_loss += float(metrics["loss"])
                steps += 1
                last_img_out = img_out
                if cfg.minibatch_subset:
                    # this host's rows of the global per-sample CER vector
                    cers_np = self._fetch_rows(metrics["cers"])
                    for r in range(Bl):
                        self.all_cers.setdefault(
                            batch.names[r], []).append(float(cers_np[r]))

            if cfg.minibatch_subset:
                self._save_side_jsons(epoch)

            # Train-only snapshot BEFORE _validate(): the reference's area
            # ledger counts only training queries in both Black-Box counters
            # and the CRNN_loss denominator (train_nn_area.py:257-267,
            # 306-307 — its validation get_labels calls never touch
            # epoch_bb_calls/total_bb_calls).
            epoch_bb_calls = self.ocr.epoch_calls
            if self._pc > 1:
                # global ledger: sum the per-host engine counters (each host
                # queried only its own pinned rows; device losses are
                # already global — computed over the assembled batch)
                from qea_ocr_tpu.parallel import process_sum
                epoch_bb_calls = int(process_sum([epoch_bb_calls])[0])
            total_train_bb_calls += epoch_bb_calls
            val = self._validate()
            metrics_out = {
                "CRNN_accuracy": val["crnn_acc"],
                f"{cfg.ocr}_accuracy": val["ocr_acc"],
                "CRNN_CER": val["crnn_cer"],
                f"{cfg.ocr}_cer": val["ocr_cer"],
                "Epoch": epoch + 1,
                "train_loss": training_loss / max(1, steps),
                "val_loss": val["loss"],
                "Total Black-Box Calls": total_train_bb_calls,
                "Black-Box Calls": epoch_bb_calls,
                "Total CRNN Updates": total_crnn_updates,
                "CRNN Updates": epoch_crnn_updates,
                "CRNN_loss": crnn_loss_acc / max(1, epoch_bb_calls),
                "CRNN_OCR_Matching_ACC": val["match_acc"],
                "CRNN_OCR_Matching_CER": val["match_cer"],
            }
            if self._pi == 0:
                # process 0 owns the metrics stream + sample images
                # (replicated state: one copy is the truth)
                self.logger.log(metrics_out)
                if last_img_out is not None:
                    save_image_png(
                        self._fetch_rows(last_img_out)[0],
                        os.path.join(self.dirs.img_out, f"out_{epoch}.png"))
            ocr_acc = val["ocr_acc"]
            # orbax saves are COLLECTIVE under jax.distributed — every
            # process must enter them; ocr_acc comes from global reductions,
            # so path names and the best-checkpoint branch agree everywhere.
            prep_path = os.path.join(
                self.dirs.ckpts, f"Prep_model_{epoch}_{ocr_acc * 100:.2f}")
            save_checkpoint(prep_path, self._eval_prep_state())
            save_checkpoint(os.path.join(self.dirs.ckpts, f"CRNN_model_{epoch}"),
                            self.crnn_state)
            if ocr_acc > best_val_acc:
                best_val_acc, best_val_epoch = ocr_acc, epoch
                save_checkpoint(os.path.join(self.dirs.ckpts, "Prep_model_best"),
                                self._eval_prep_state())
                if self._pi == 0:
                    self.logger.update_summary(
                        {"best_val_acc": best_val_acc,
                         "best_val_epoch": best_val_epoch})
            self._maybe_optuna(ocr_acc * 100, epoch)
        print("Training Completed.")
        return best_val_acc, best_val_epoch

    # ------------------------------------------------------------------
    def _phase_a(self, batch, img_preds, bb_mask, sel_rows, sel_ids,
                 n_jitter, Bl, L, W):
        """One CRNN (proxy) update. All host-side arrays here hold this
        host's LOCAL `Bl` rows (each host OCRs only its own pinned crops);
        `_dev` assembles the global (B, ...) device arrays."""
        cfg = self.cfg
        preds_np = self._fetch_rows(img_preds)
        sel_imgs = preds_np[sel_rows]

        hist_labels = np.full((Bl, W, L), self.charmap.pad_id, np.int32)
        hist_lengths = np.zeros((Bl, W), np.int32)
        hist_valid = np.zeros((Bl, W), bool)
        if cfg.inner_limit_skip:
            res = self.ocr.query(sel_imgs)
            lw = self._gen_weights(sel_ids)
            if cfg.weightgen_method == "decaying":
                loss_weights = lw
            else:
                full = np.zeros((Bl, W + 1), np.float32)
                full[sel_rows] = np.asarray(lw)
                loss_weights = self._dev(full)
            self.history.add(sel_ids, res.labels, res.lengths, res.texts)
            labs, lens, valid = self.history.gather(sel_ids)
            hist_labels[sel_rows] = labs
            hist_lengths[sel_rows] = lens
            hist_valid[sel_rows] = valid
        else:
            loss_weights = decaying_weights(cfg.decay_factor, W)

        jitter_images = np.ones((n_jitter, *preds_np.shape), np.float32)
        jitter_labels = np.full((n_jitter, Bl, L), self.charmap.pad_id,
                                np.int32)
        jitter_lengths = np.zeros((n_jitter, Bl), np.int32)
        for i in range(n_jitter):
            noisy = self._noise(sel_imgs)
            res = self.ocr.query(noisy)
            jitter_images[i, sel_rows] = noisy
            jitter_labels[i, sel_rows] = res.labels
            jitter_lengths[i, sel_rows] = res.lengths

        self.crnn_state, loss = self._patch_steps.phase_a(
            self.crnn_state, img_preds, self._dev(bb_mask),
            self._dev(hist_labels), self._dev(hist_lengths),
            self._dev(hist_valid), loss_weights,
            self._dev(jitter_images, dim=1),
            self._dev(jitter_labels, dim=1),
            self._dev(jitter_lengths, dim=1),
            decaying=(cfg.weightgen_method == "decaying"),
            inner_limit_skip=cfg.inner_limit_skip)
        self._last_crnn_loss = float(loss)

    # ------------------------------------------------------------------
    def _eval_prep_state(self):
        """Validation/checkpoint view of the prep: EMA params when enabled
        (the deployable artifact), raw training params otherwise."""
        if self.ema_params is None:
            return self.prep_state
        return self.prep_state.replace(params=self.ema_params)

    def _validate(self):
        cfg = self.cfg
        B = cfg.batch_size
        agg = dict(crnn_crt=0.0, crnn_cer=0.0, ocr_crt=0.0, ocr_cer=0.0,
                   match_crt=0.0, match_cer=0.0, loss=0.0)
        count = 0
        if self._pc == 1:
            for batch in batch_iterator(
                    self.val_ds, B,
                    partial(collate_words, charmap=self.charmap),
                    shuffle=False, drop_last=False,
                    num_workers=default_num_workers(), prefetch=2):
                # score EVERY val sample: the tail batch is padded to the
                # compiled shape and masked out. DELIBERATE deviation from
                # the reference, which builds its val loader with
                # drop_last=True (train_nn_area.py:137) yet divides by the
                # FULL val_set_size (:347) — the dropped tail silently
                # counts as wrong, deflating its area metrics whenever
                # val_size % batch_size != 0. We score what we divide by
                # (see PARITY.md, reference-defects note).
                real = batch.images.shape[0]
                batch = pad_wordbatch(batch, B)
                mask = np.arange(B) < real
                count += self._validate_batch(batch, mask, agg)
        else:
            # multi-process: each global window of B val crops is split
            # into per-host Bl slices; hosts whose slice is empty feed an
            # all-padding batch so the jitted lockstep holds. Metrics come
            # out of GLOBAL masked reductions — every host returns
            # identical numbers (patch-trainer parity).
            from qea_ocr_tpu.data.pipeline import blank_wordbatch
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
                count += self._validate_batch(batch, mask, agg)
        n = max(1, count)
        return dict(
            crnn_acc=agg["crnn_crt"] / n, ocr_acc=agg["ocr_crt"] / n,
            match_acc=agg["match_crt"] / n, crnn_cer=agg["crnn_cer"] / n,
            ocr_cer=agg["ocr_cer"] / n, match_cer=agg["match_cer"] / n,
            loss=agg["loss"] / n)

    def _validate_batch(self, batch, mask, agg) -> int:
        """Score one (local) validation batch into `agg`; `batch`/`mask`
        hold this host's rows, reductions run on the assembled global
        arrays. Returns the GLOBAL real-sample count of the window."""
        L = self.charmap.max_len
        mask_dev = self._dev(mask)
        img_out, dec, dec_len, loss = self.steps.val_forward(
            self._eval_prep_state(), self.crnn_state,
            self._put_images(batch.images),
            self._dev(batch.labels), self._dev(batch.lengths), mask_dev)
        # OCR only this host's real rows (keeps the val query count exact)
        real = int(mask.sum())
        Bl = len(mask)
        preds_np = self._fetch_rows(img_out)
        res = self.ocr.query(preds_np[:real]) if real else None
        width = res.labels.shape[1] if res is not None else L
        ocr_labels = np.zeros((Bl, width), np.int32)
        ocr_lengths = np.zeros((Bl,), np.int32)
        if res is not None:
            ocr_labels[:real] = res.labels
            ocr_lengths[:real] = res.lengths
        ocr_labels = self._dev(ocr_labels)
        ocr_lengths = self._dev(ocr_lengths)
        gt = self._dev(batch.labels)
        gt_len = self._dev(batch.lengths)
        dec_c, dec_l = dec[:, :L], jnp.minimum(dec_len, L)
        crt, cer, _ = self._compare(dec_c, dec_l, gt, gt_len, mask_dev)
        t_crt, t_cer, _ = self._compare(
            ocr_labels, ocr_lengths, gt, gt_len, mask_dev)
        m_crt, m_cer, _ = self._compare(
            dec_c, dec_l, ocr_labels, ocr_lengths, mask_dev)
        real_global = int(jnp.sum(mask_dev))
        agg["crnn_crt"] += float(crt); agg["crnn_cer"] += float(cer)
        agg["ocr_crt"] += float(t_crt); agg["ocr_cer"] += float(t_cer)
        agg["match_crt"] += float(m_crt); agg["match_cer"] += float(m_cer)
        # batch loss is a masked mean over the window's real samples;
        # x real recovers the per-sample sum so the padded tail window
        # carries proportional (not equal-batch) weight
        agg["loss"] += float(loss) * real_global
        return real_global

    def _save_side_jsons(self, epoch):
        # History/selection/CER side-state is host-LOCAL (crops are pinned
        # to hosts): under multiple processes each host writes its own
        # shard, suffixed .pN (patch-trainer convention, utils/io.py
        # resolve_side_shard).
        sfx = f".p{self._pi}" if self._pc > 1 else ""

        def _p(dirname, name):
            base, ext = os.path.splitext(name)
            return os.path.join(dirname, base + sfx + ext)

        self.history.save_json(
            _p(self.dirs.tracked_labels, f"tracked_labels_{epoch}.json"),
            dict(enumerate(self.train_ds.names)))
        self.history.save_json(
            _p(self.dirs.tracked_labels, "tracked_labels_current.json"),
            dict(enumerate(self.train_ds.names)))
        save_json(self.selected_samples,
                  _p(self.dirs.selected_samples,
                     "selected_samples_current.json"))
        save_json(self.all_cers, _p(self.dirs.cers, "all_cers.json"))

    def _maybe_optuna(self, accuracy, epoch):
        trial = self.cfg.optuna_trial
        if trial is None:
            return
        trial.report(accuracy, epoch)
        if trial.should_prune():
            try:
                import optuna
                raise optuna.TrialPruned()
            except ImportError:
                raise RuntimeError("optuna trial pruned")
