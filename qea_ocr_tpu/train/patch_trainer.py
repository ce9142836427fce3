"""Budget-aware patch preprocessor trainer (the flagship entry point).

Capability parity with reference `train_nn_patch.py:34-467` (see SURVEY.md
§3.1), re-architected for TPU:

  * documents are batched (`batch_docs` >= 1; the reference hardwires batch
    size 1, `train_nn_patch.py:37`) and every per-strip Python loop is a
    fixed-shape masked device op;
  * CER bookkeeping, selection, greedy decode, and entropy estimates run
    inside the compiled phase steps (`qea_ocr_tpu.train.patch_steps`);
  * the black-box OCR is the only host boundary, behind the async
    `OcrQueryEngine`;
  * checkpoints are orbax pytrees + the reference's JSON side-state
    (tracked labels / CER history / selected-samples bitmap) for drop-in
    artifact compatibility.

Two-phase step semantics preserved:
  PHASE A (proxy): OCR the budget-selected cleaned strips; weighted CTC over
    label history (weights generated from pre-update history, reference
    order `train_nn_patch.py:282-283`) plus jittered-OCR CTC inner loops;
    one CRNN optimizer step per batch.
  PHASE B (prep): CTC(GT) through the strip gather with frozen CRNN batch
    stats + sec_loss_scalar * MSE(doc, white); prep optimizer step
    (optionally CRNN too via `update_CRNN`); CER table refresh from CRNN
    decode vs GT.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qea_ocr_tpu import config as C
from qea_ocr_tpu.data.datasets import PatchDocuments
from qea_ocr_tpu.data.pipeline import (
    DocBatch, batch_iterator, blank_docbatch, collate_docs,
    default_num_workers, pad_docbatch)
from qea_ocr_tpu.models import CRNN, HistoryAttention, UNet
from qea_ocr_tpu.ocr.base import get_ocr_helper
from qea_ocr_tpu.ocr.engine import OcrQueryEngine
from qea_ocr_tpu.ops.edit_distance import compare_labels_device
from qea_ocr_tpu.selection import (
    is_global,
    membership_mask,
    select_batch,
    GLOBAL_METHODS,
)
from qea_ocr_tpu.tracking import (
    LabelHistory,
    attention_weights,
    decaying_weights,
    levenshtein_weights,
    weightgenerator_factory,
)
from qea_ocr_tpu.train.patch_steps import make_steps
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.charmap import CharMap
from qea_ocr_tpu.utils.io import (
    ExpDirs, load_json, resolve_side_shard, save_checkpoint, save_image_png,
    save_json)
from qea_ocr_tpu.utils.metrics import MetricsLogger, StepTimer


@dataclasses.dataclass
class PatchTrainerConfig:
    # reference flag surface (patch_cli.py:10-156)
    lr_crnn: float = 1e-4
    lr_prep: float = 5e-5
    scalar: float = 1.0                    # secondary-loss scalar
    epochs: int = 25
    random_seed: int = 42
    std: int = 5
    inner_limit: int = 2
    inner_limit_skip: bool = False
    crnn_model: Optional[str] = None       # checkpoint to load
    prep_model: Optional[str] = None
    exp_base_path: str = "."
    ocr: str = "Tesseract"
    random_std: bool = True
    minibatch_subset: Optional[str] = None
    minibatch_subset_prop: float = 0.5
    start_epoch: int = 0
    data_base_path: str = "."
    warmup_epochs: int = 0
    exp_name: str = "test_patch"
    train_subset_size: Optional[int] = None
    val_subset_size: Optional[int] = None
    weight_decay: float = 5e-4
    cers_ocr_path: Optional[str] = None
    image_prop: Optional[float] = None
    discount_factor: float = 1.0
    update_CRNN: bool = False
    window_size: int = 1
    query_dim: int = 32
    emb_dim: int = 256
    attn_activation: str = "sigmoid"
    weightgen_method: str = "decaying"
    decay_factor: float = 0.7
    pruning_artifact: Optional[str] = None
    optim_crnn_path: Optional[str] = None  # full-state resume (params + Adam
    optim_prep_path: Optional[str] = None  # moments), reference --optim_*_path
    tracked_labels_path: Optional[str] = None  # resume label history (JSON)
    profile_dir: Optional[str] = None          # jax.profiler trace output
    prep_pretrain_epochs: int = 0  # identity/denoise pretraining of the UNet
                                   # before the budget loop (skipped when a
                                   # --prep_model checkpoint is loaded)
    prep_pretrain_lr: float = 1e-3 # pretraining uses its own (higher) lr;
                                   # the UNet's skip connections make near-
                                   # identity easy to reach quickly
    # TPU-native additions
    async_ocr: bool = True    # pipeline host OCR of batch k+1 over device
                              # compute of batch k (strips one prep-update
                              # stale relative to the synchronous reference;
                              # identical budget accounting — measured 28%
                              # wall-clock win, benchmarks/RESULTS.md).
                              # Default ON since round 2; --no-async_ocr /
                              # async_ocr=False restores reference-exact
                              # synchronous querying.
    data_parallel: bool = False  # shard the document batch over all devices
                                 # (batch_docs must divide the device count)
    tensor_parallel: int = 0  # >0: 2-D (data x model) GSPMD mesh with this
                              # many model-axis shards — params + Adam
                              # moments feature-sharded over `model`
                              # (parallel/tp.py), batch sharded over `data`;
                              # the ZeRO/weight-sharded regime for larger
                              # unet_features/lstm_hidden variants
    prep_ema: float = 0.0  # >0: keep an exponential moving average of the
                           # prep params (decay=this value, updated after
                           # every phase-B step) and use it for validation
                           # and checkpoints. Same co-adaptation-drift
                           # countermeasure as the area trainer's
                           # --prep_ema (benchmarks/RESULTS.md ablation:
                           # 73.8% -> 86.7% on the word-crop path). Seeded
                           # AFTER pretrain/warm-start so the average never
                           # blends untrained init params.
    micro_steps: int = 1  # G > 1: split each D-doc batch into G sequential
                          # chunks INSIDE the jitted fused step (lax.scan),
                          # taking G phase-A CRNN updates and G phase-B prep
                          # updates per dispatch. Recovers the reference's
                          # small-batch optimizer-step dynamics
                          # (`train_nn_patch.py:37` trains at bs=1 doc) at
                          # large-D amortization of selection/OCR/dispatch;
                          # the per-epoch query ledger is unchanged. Must
                          # divide batch_docs (and the per-chunk doc count
                          # must still be a device-count multiple under
                          # data_parallel). See patch_steps micro-stepping
                          # note for the documented one-batch strip
                          # staleness in phase A.
    micro_refresh: bool = False  # re-extract phase-A history strips from
                          # the CURRENT prep inside each micro-chunk (one
                          # extra UNet eval forward per chunk) — the
                          # reference's per-doc freshness. Required for
                          # stability at chunk sizes near 1 (see
                          # patch_steps._phase_ab_micro).
    batch_docs: int = 1
    max_strips: int = 32
    dataset: str = "patch"                 # patch | synthetic
    synthetic_train_docs: int = 32
    synthetic_val_docs: int = 8
    synthetic_strips_per_doc: int = 6
    corruption: Optional[dict] = None
    doc_size: tuple = C.DOC_SIZE
    lstm_hidden: int = 256
    unet_features: int = 32
    use_wandb: bool = False
    optuna_trial: object = None


class TrainNNPrep:
    """Patch-dataset two-phase trainer."""

    def __init__(self, cfg: PatchTrainerConfig):
        self.cfg = cfg
        self.charmap = CharMap.default()
        self.dirs = ExpDirs(cfg.exp_base_path).create()
        np.random.seed(cfg.random_seed)
        self._np_rng = np.random.default_rng(cfg.random_seed)
        self._key = jax.random.PRNGKey(cfg.random_seed)

        # ----------------------------------------------------------- data
        if cfg.dataset == "synthetic":
            corruption = cfg.corruption
            self.dataset = PatchDocuments.synthetic(
                cfg.synthetic_train_docs, seed=cfg.random_seed,
                n_strips=cfg.synthetic_strips_per_doc,
                max_strips=cfg.max_strips, corruption=corruption,
                doc_size=cfg.doc_size)
            self.validation_set = PatchDocuments.synthetic(
                cfg.synthetic_val_docs, seed=cfg.random_seed + 1,
                n_strips=cfg.synthetic_strips_per_doc,
                max_strips=cfg.max_strips, corruption=corruption,
                doc_size=cfg.doc_size)
        else:
            self.dataset = PatchDocuments(
                os.path.join(cfg.data_base_path, C.PATCH_TRAIN),
                max_strips=cfg.max_strips, num_subset=cfg.train_subset_size,
                doc_size=cfg.doc_size)
            self.validation_set = PatchDocuments(
                os.path.join(cfg.data_base_path, C.PATCH_DEV),
                max_strips=cfg.max_strips, num_subset=cfg.val_subset_size,
                doc_size=cfg.doc_size)

        self.train_indices = self._training_indices()
        self.train_set_size = len(self.train_indices)
        self.val_set_size = len(self.validation_set)

        backend = get_ocr_helper(cfg.ocr)
        if backend is None:
            raise ValueError(f"unknown OCR backend {cfg.ocr!r}")
        self.ocr = OcrQueryEngine(backend, self.charmap)

        # ----------------------------------------------------------- models
        from qea_ocr_tpu.utils.platform import default_mxu_packed
        # Grad path pins conv_impl="xla": the channel-major Pallas conv's
        # BACKWARD at document batches OOMs (27.6G vs 15.75G HBM at D=96,
        # measured — saved padded-flat activations + custom-call layout
        # copies). The no-grad forwards (prep_extract, val_forward) use a
        # param-compatible twin that resolves `auto` (QEA_CONV_IMPL) so an
        # explicit =cmajor opt-in reroutes only transient-activation
        # forwards. Checkpoints are identical across conv_impl values.
        self.prep_model = UNet(init_features=cfg.unet_features,
                               mxu_packed=default_mxu_packed(),
                               conv_impl="xla")
        self.prep_eval_model = UNet(init_features=cfg.unet_features,
                                    mxu_packed=default_mxu_packed())
        self.crnn_model = CRNN(vocab_size=self.charmap.vocab_size,
                               lstm_hidden=cfg.lstm_hidden)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(cfg.random_seed), 3)
        prep_vars = self.prep_model.init(
            k1, jnp.zeros((1, 1, *cfg.doc_size)), train=False)
        crnn_vars = self.crnn_model.init(
            k2, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False)
        self.prep_state = ModelState.create(
            prep_vars, adam_l2(cfg.lr_prep, cfg.weight_decay))
        self.crnn_state = ModelState.create(
            crnn_vars, adam_l2(cfg.lr_crnn, cfg.weight_decay))
        from qea_ocr_tpu.train.state import set_learning_rate
        from qea_ocr_tpu.utils.io import load_checkpoint
        if cfg.prep_model:
            # model-only warm start (fresh optimizer, reference torch.load)
            self.prep_state = load_checkpoint(cfg.prep_model, self.prep_state)
        if cfg.crnn_model:
            self.crnn_state = load_checkpoint(cfg.crnn_model, self.crnn_state)
        if cfg.optim_prep_path:
            # explicit full-state resume (reference --optim_prep_path)
            self.prep_state = load_checkpoint(
                cfg.optim_prep_path, self.prep_state, restore_opt=True)
            self.prep_state = set_learning_rate(self.prep_state, cfg.lr_prep)
        if cfg.optim_crnn_path:
            self.crnn_state = load_checkpoint(
                cfg.optim_crnn_path, self.crnn_state, restore_opt=True)
            self.crnn_state = set_learning_rate(self.crnn_state, cfg.lr_crnn)

        # ------------------------------------------------- tracking/weights
        self.weightgen_method = weightgenerator_factory(cfg.weightgen_method)
        self.history = LabelHistory(
            self.dataset.num_strips, cfg.window_size, self.charmap)
        if cfg.tracked_labels_path:
            # multi-process runs shard side-state per host (.pN suffix,
            # _save_side_jsons); resume prefers this process's shard so a
            # pod run can restart from its own history files by passing the
            # unsuffixed name
            path = resolve_side_shard(
                cfg.tracked_labels_path, jax.process_index())
            self.history.load_json(path, self.dataset.name_to_id)
        self.attn_model = None
        self.attn_vars = None
        if cfg.weightgen_method == "self_attention":
            self.attn_model = HistoryAttention(
                char_vocab_size=self.charmap.vocab_size,
                emb_size=cfg.emb_dim, query_dim=cfg.query_dim,
                window_size=cfg.window_size,
                activation=cfg.attn_activation)
            self.attn_vars = self.attn_model.init(
                k3, jnp.zeros(
                    (1, cfg.window_size, self.charmap.max_len), jnp.int32))

        # ------------------------------------------------- CER/side state
        n = self.dataset.num_strips
        cers0 = np.ones((n,), np.float32)
        self.selected_samples: Dict[str, List[bool]] = {}
        if cfg.cers_ocr_path:
            seed = load_json(cfg.cers_ocr_path)
            for name, cer in seed.items():
                if name in self.dataset.name_to_id:
                    cers0[self.dataset.name_to_id[name]] = cer
            for name in seed:
                self.selected_samples[name] = [False] * cfg.epochs
        self.cer_table = jnp.asarray(cers0)
        self.ent_table = jnp.ones((n,), jnp.float32)
        self.all_cers: Dict[str, List[float]] = {}
        self.global_bitmap = np.zeros((n,), bool)

        self.steps = make_steps(
            self.prep_model, self.crnn_model, self.charmap,
            sec_loss_scalar=cfg.scalar,
            prep_eval_model=self.prep_eval_model)

        # Optional GSPMD data parallelism: replicate states, shard batches on
        # the document axis; XLA partitions the same jitted steps and inserts
        # the gradient psum from the sharding annotations.
        self.mesh = None
        if cfg.tensor_parallel:
            # 2-D (data x model) mesh: params/moments feature-sharded over
            # `model`, batches sharded over `data`. The batch-placement
            # calls below are unchanged — P("data") on a 2-D mesh means
            # "sharded over data, replicated over model".
            from qea_ocr_tpu.parallel import (
                make_mesh_2d, put_replicated, put_tp)
            n_dev = len(jax.devices())
            tp = cfg.tensor_parallel
            if n_dev % tp:
                raise ValueError(
                    f"tensor_parallel={tp} must divide device count {n_dev}")
            n_data = n_dev // tp
            if cfg.batch_docs % n_data:
                raise ValueError(
                    f"batch_docs={cfg.batch_docs} must be a multiple of the "
                    f"data-axis size {n_data} (= {n_dev} devices / tp {tp})")
            self.mesh = make_mesh_2d(n_data, tp)
            self.prep_state = put_tp(self.prep_state, self.mesh)
            self.crnn_state = put_tp(self.crnn_state, self.mesh)
            self.cer_table = put_replicated(self.cer_table, self.mesh)
            self.ent_table = put_replicated(self.ent_table, self.mesh)
        elif cfg.data_parallel:
            from qea_ocr_tpu.parallel import make_mesh, put_replicated
            self.mesh = make_mesh()
            n_dev = len(self.mesh.devices.flat)
            if cfg.batch_docs % n_dev:
                raise ValueError(
                    f"batch_docs={cfg.batch_docs} must be a multiple of the "
                    f"device count {n_dev} for data_parallel mode")
            self.prep_state = put_replicated(self.prep_state, self.mesh)
            self.crnn_state = put_replicated(self.crnn_state, self.mesh)
            self.cer_table = put_replicated(self.cer_table, self.mesh)
            self.ent_table = put_replicated(self.ent_table, self.mesh)

        # ------------------------------------------- multi-host topology
        # Under multiple JAX processes (TPU pods), `batch_docs` is the
        # GLOBAL batch: each host loads/owns only its Dl = batch_docs/pc
        # rows (pinned document subset, `parallel/multihost.py`), runs the
        # black-box OCR for its own strips, and the device boundary
        # assembles global arrays (`put_batch_global`). Single-process,
        # everything below is the identity.
        self._pc = jax.process_count() if self.mesh is not None else 1
        self._pi = jax.process_index() if self.mesh is not None else 0
        if self._pc > 1:
            if cfg.tensor_parallel:
                raise NotImplementedError(
                    "multi-process runs support data parallelism only "
                    "(tensor_parallel shards within one host's chips)")
            if cfg.batch_docs % self._pc:
                raise ValueError(
                    f"batch_docs={cfg.batch_docs} must be a multiple of the "
                    f"process count {self._pc}")
        self._dl = cfg.batch_docs // self._pc  # local docs per step
        if cfg.micro_steps > 1:
            if cfg.batch_docs % cfg.micro_steps:
                raise ValueError(
                    f"micro_steps={cfg.micro_steps} must divide "
                    f"batch_docs={cfg.batch_docs}")
            chunk = cfg.batch_docs // cfg.micro_steps
            if self.mesh is not None:
                n_data = self.mesh.shape.get("data", 1)
                if chunk % n_data:
                    raise ValueError(
                        f"micro-step chunk size {chunk} (batch_docs "
                        f"{cfg.batch_docs} / micro_steps {cfg.micro_steps}) "
                        f"must be a multiple of the data-axis size {n_data}")
        from qea_ocr_tpu.parallel import pinned_subset
        self._local_train_indices = pinned_subset(
            self.train_indices, self._pi, self._pc)
        if self._pc > 1:
            # lockstep trim: every host owns the same count; the ledger
            # denominators use the effective global size
            self.train_set_size = len(self._local_train_indices) * self._pc

        self.logger = MetricsLogger(
            cfg.exp_base_path,
            use_wandb=cfg.use_wandb and self._pi == 0)
        self.timer = StepTimer()
        self._compare = jax.jit(compare_labels_device)
        self.ema_params = None      # seeded in _train_impl (post-pretrain)
        if cfg.prep_ema > 0.0:
            decay = float(cfg.prep_ema)
            self._ema_update = jax.jit(
                lambda ema, p: jax.tree_util.tree_map(
                    lambda a, b: decay * a + (1.0 - decay) * b, ema, p))

    # ------------------------------------------------------------------
    def _eval_prep_state(self):
        """Validation/checkpoint view of the prep: EMA params when enabled
        (the deployable artifact), raw training params otherwise."""
        if self.ema_params is None:
            return self.prep_state
        return self.prep_state.replace(params=self.ema_params)

    # ------------------------------------------------------------------
    def _dev(self, x, dim: int = 0):
        """Device placement for batch-dimension arrays: plain `jnp.asarray`
        under one process (jit shards on the mesh), global-array assembly
        from this process's local rows under many (`dim` = the sharded
        dimension, e.g. 1 for (n_jitter, N, ...) stacks)."""
        if self._pc == 1:
            return jnp.asarray(x)
        from qea_ocr_tpu.parallel import (
            global_from_local, global_from_local_dim)
        if dim == 0:
            return global_from_local(x, self.mesh)
        return global_from_local_dim(x, self.mesh, dim)

    def _fetch_rows(self, global_array) -> np.ndarray:
        """Host copy of this process's rows of a batch-sharded device
        array (the whole array under one process)."""
        if self._pc == 1:
            return np.asarray(global_array)
        from qea_ocr_tpu.parallel import local_rows
        return local_rows(global_array)

    # ------------------------------------------------------------------
    def _training_indices(self) -> np.ndarray:
        cfg = self.cfg
        idx = np.arange(len(self.dataset))
        if cfg.pruning_artifact:
            from qea_ocr_tpu.pruning.prune import pruning_indices
            idx = pruning_indices(self.dataset, cfg.pruning_artifact)
        elif cfg.train_subset_size:
            rng = np.random.default_rng(cfg.random_seed)
            idx = rng.permutation(idx)[: cfg.train_subset_size]
        return idx

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _noise(self, images: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        B = images.shape[0]
        if cfg.random_std:
            stds = self._np_rng.integers(0, cfg.std + 1, B) / 100.0
        else:
            stds = np.full(B, cfg.std / 100.0)
        noise = self._np_rng.normal(0.0, 1.0, images.shape).astype(np.float32)
        noise *= stds.reshape(B, *([1] * (images.ndim - 1))).astype(np.float32)
        return np.clip(images - noise, 0.0, 1.0)

    # ------------------------------------------------------------------
    def _select(self, batch: DocBatch, epoch: int):
        """Returns bb_mask (D,S) bool numpy + per-doc counts."""
        cfg = self.cfg
        valid = jnp.asarray(batch.strip_mask)
        ids = jnp.asarray(batch.strip_ids)
        if (not cfg.minibatch_subset) or epoch < cfg.warmup_epochs:
            return np.asarray(batch.strip_mask)
        if is_global(cfg.minibatch_subset):
            m = membership_mask(ids, jnp.asarray(self.global_bitmap)) & valid
            return np.asarray(m)
        est_table = (self.ent_table
                     if cfg.minibatch_subset == "uniformEntropy"
                     else self.cer_table)
        est = est_table[ids]
        bb_mask, _ = select_batch(
            cfg.minibatch_subset, self._next_key(), est, valid,
            cfg.minibatch_subset_prop)
        return np.asarray(bb_mask)

    def _gen_weights(self, sel_ids: np.ndarray):
        """Loss weights from PRE-update history (reference order)."""
        cfg = self.cfg
        if cfg.weightgen_method == "decaying":
            return decaying_weights(cfg.decay_factor, cfg.window_size)
        labs, lens, valid = self.history.gather(sel_ids)
        if cfg.weightgen_method == "levenshtein":
            return levenshtein_weights(
                jnp.asarray(labs), jnp.asarray(lens), jnp.asarray(valid))
        return attention_weights(
            self.attn_model.apply, self.attn_vars,
            jnp.asarray(labs), jnp.asarray(valid))

    # ------------------------------------------------------------------
    def train(self):
        from qea_ocr_tpu.utils.metrics import maybe_profile
        with maybe_profile(self.cfg.profile_dir):
            return self._train_impl()

    def _prep_pretrain(self):
        """Identity/denoise pretraining epochs for the UNet."""
        from qea_ocr_tpu.train.state import set_learning_rate
        cfg = self.cfg
        self.prep_state = set_learning_rate(self.prep_state,
                                            cfg.prep_pretrain_lr)
        for epoch in range(cfg.prep_pretrain_epochs):
            total, n = 0.0, 0
            for batch in batch_iterator(
                    self.dataset, self._dl, collate_docs,
                    seed=cfg.random_seed + 7000, epoch=epoch,
                    indices=self._local_train_indices):
                if self.mesh is not None:
                    # numpy straight to global placement (no device round
                    # trip — see _prepare_work)
                    from qea_ocr_tpu.parallel import put_batch_global
                    images = put_batch_global(batch.images, self.mesh)
                else:
                    images = jnp.asarray(batch.images)
                self.prep_state, loss = self.steps.prep_pretrain_step(
                    self.prep_state, images)
                total += float(loss)
                n += 1
            print(f"[prep-pretrain] epoch {epoch} mse {total / max(1, n):.5f}")
        self.prep_state = set_learning_rate(self.prep_state, cfg.lr_prep)

    def _train_impl(self):
        cfg = self.cfg
        if cfg.prep_pretrain_epochs and not cfg.prep_model:
            self._prep_pretrain()
        if cfg.prep_ema > 0.0:
            # deep-copy: phase_ab/phase_b DONATE prep_state, so aliasing its
            # param buffers here would leave the EMA pointing at deleted
            # arrays
            self.ema_params = jax.tree_util.tree_map(
                jnp.array, self.prep_state.params)
        D, S = cfg.batch_docs, cfg.max_strips
        L = self.charmap.max_len
        W = cfg.window_size
        n_jitter = max(0, cfg.inner_limit - (1 if cfg.inner_limit_skip else 0)) \
            if cfg.inner_limit else 0
        best_val_acc, best_val_epoch = 0.0, 0
        total_crnn_updates = 0
        # reference ledger split (`train_nn_patch.py:199,298,398,410-413`):
        # "Total Black-Box Calls" counts TRAIN queries only; the cumulative
        # train+val ledger is its own metric.
        total_train_bb_calls = 0
        total_train_val_bb_calls = 0

        for epoch in range(cfg.start_epoch, cfg.epochs):
            if is_global(cfg.minibatch_subset):
                self._global_select(epoch)
            indices = self._local_train_indices
            if cfg.image_prop:
                # per-host subsample of the pinned subset: the global
                # effective proportion matches, and lockstep holds because
                # every host's subset has the same size
                k = int(cfg.image_prop * len(indices))
                indices = self._np_rng.permutation(indices)[:k]
            self.ocr.reset_epoch()
            epoch_print = True
            training_loss = crnn_loss_acc = 0.0
            steps = 0
            epoch_crnn_updates = 0
            last_doc_out = None
            last_batch = None

            pending = None
            for batch in batch_iterator(
                    self.dataset, self._dl, collate_docs,
                    seed=cfg.random_seed,
                    epoch=epoch, indices=indices,
                    num_workers=default_num_workers(), prefetch=2):
                work = self._prepare_work(batch, epoch, n_jitter,
                                          epoch_print)
                epoch_print = False
                if not cfg.async_ocr:
                    out = self._process_work(work, n_jitter, L, W)
                else:
                    # 1-deep pipeline: device processes batch k while the
                    # host OCRs batch k+1 (submitted in _prepare_work).
                    out, pending = (
                        self._process_work(pending, n_jitter, L, W)
                        if pending is not None else None, work)
                if out is None:
                    continue
                stats = out
                training_loss += stats["loss"]
                crnn_loss_acc += stats["crnn_loss"]
                total_crnn_updates += stats["crnn_updates"]
                epoch_crnn_updates += stats["crnn_updates"]
                steps += 1
                last_doc_out, last_batch = stats["doc_out"], stats["batch"]
            if pending is not None:
                stats = self._process_work(pending, n_jitter, L, W)
                training_loss += stats["loss"]
                crnn_loss_acc += stats["crnn_loss"]
                total_crnn_updates += stats["crnn_updates"]
                epoch_crnn_updates += stats["crnn_updates"]
                steps += 1
                last_doc_out, last_batch = stats["doc_out"], stats["batch"]

            if cfg.minibatch_subset:
                self._save_side_jsons(epoch)

            epoch_bb_calls = self.ocr.epoch_calls  # train-only snapshot:
            # _validate() also queries the engine, and the reference keeps
            # "Black-Box Calls" train-only (`train_nn_patch.py:298-299,411`)
            if self._pc > 1:
                # global ledger: sum the per-host engine counters (each
                # host queried only its own pinned documents; the device
                # losses are already global — computed over the assembled
                # batch and replicated)
                from qea_ocr_tpu.parallel import process_sum
                epoch_bb_calls = int(process_sum([epoch_bb_calls])[0])
            print(f"Epoch BB calls - {epoch_bb_calls}")
            val = self._validate()
            total_train_bb_calls += epoch_bb_calls
            total_train_val_bb_calls += epoch_bb_calls + val["bb_calls"]
            # per-batch phase-B losses are means over the D docs of the
            # batch; x D recovers a per-doc sum, and the reference divides
            # by the full train set size (`train_nn_patch.py:350`)
            train_loss = training_loss * D / max(1, self.train_set_size)
            crnn_train_loss = crnn_loss_acc / max(1, epoch_bb_calls)

            metrics_out = {
                "CRNN_accuracy": val["crnn_acc"],
                f"{cfg.ocr}_accuracy": val["ocr_acc"],
                "CRNN_CER": val["crnn_cer"],
                f"{cfg.ocr}_cer": val["ocr_cer"],
                "Epoch": epoch + 1,
                "train_loss": train_loss,
                "val_loss": val["loss"],
                "Total Black-Box Calls": total_train_bb_calls,
                "Black-Box Calls": epoch_bb_calls,
                "Train + Val BB Calls": epoch_bb_calls + val["bb_calls"],
                "Total Train + Val BB Calls": total_train_val_bb_calls,
                "Total CRNN Updates": total_crnn_updates,
                "CRNN Updates": epoch_crnn_updates,
                "CRNN_loss": crnn_train_loss,
                "CRNN_OCR_Matching_ACC": val["match_acc"],
                "CRNN_OCR_Matching_CER": val["match_cer"],
            }
            metrics_out.update(self.timer.summary())
            if self._pi == 0:
                # process 0 owns every artifact write (metrics stream,
                # sample images, checkpoints): states/metrics are
                # replicated, so one copy is the truth
                self.logger.log(metrics_out)

            # sample cleaned image (+ original once)
            if last_doc_out is not None and self._pi == 0:
                save_image_png(
                    self._fetch_rows(last_doc_out)[0],
                    os.path.join(self.dirs.img_out, f"out_{epoch}.png"))
                if epoch == 0:
                    save_image_png(
                        last_batch.images[0],
                        os.path.join(self.dirs.img_out, "out_original.png"))

            ocr_acc = val["ocr_acc"]
            # orbax saves are COLLECTIVE under jax.distributed (every
            # process must enter the internal barrier; the primary host
            # writes once) — gating them on _pi==0 deadlocks process 0
            # against the coordination service's shutdown barrier. ocr_acc
            # comes from global reductions, so path names and the
            # best-checkpoint condition agree on every process.
            prep_path = os.path.join(
                self.dirs.ckpts, f"Prep_model_{epoch}_{ocr_acc * 100:.2f}")
            save_checkpoint(prep_path, self._eval_prep_state())
            save_checkpoint(
                os.path.join(self.dirs.ckpts, f"CRNN_model_{epoch}"),
                self.crnn_state)
            if ocr_acc > best_val_acc:
                best_val_acc, best_val_epoch = ocr_acc, epoch
                save_checkpoint(
                    os.path.join(self.dirs.ckpts, "Prep_model_best"),
                    self._eval_prep_state())
                if self._pi == 0:
                    self.logger.update_summary({
                        "best_val_acc": best_val_acc,
                        "best_val_epoch": best_val_epoch,
                    })
            self._maybe_optuna(ocr_acc * 100, epoch)
        print("Training Completed.")
        return best_val_acc, best_val_epoch

    # ------------------------------------------------------------------
    def _prepare_work(self, batch: DocBatch, epoch: int, n_jitter: int,
                      epoch_print: bool) -> dict:
        """Extract strips with the CURRENT prep, select the query budget, and
        issue the black-box OCR (sync query or async submit depending on
        `async_ocr`). Host-side noise is drawn here so the OCR and phase A
        see identical jittered images."""
        cfg = self.cfg
        if self.mesh is not None:
            # feed the NUMPY batch straight to the global placement —
            # jnp.asarray first would device_put and immediately fetch the
            # images back to host inside global_from_local, tripling the
            # (bandwidth-bound) host link traffic on the hot path
            from qea_ocr_tpu.parallel import put_batch_global
            images = put_batch_global(batch.images, self.mesh)
            bboxes = put_batch_global(batch.bboxes, self.mesh)
        else:
            images = jnp.asarray(batch.images)
            bboxes = jnp.asarray(batch.bboxes)
        with self.timer.time("prep_extract"):
            _, strips = self.steps.prep_extract(self.prep_state, images, bboxes)
        # Everything below is host-LOCAL: `batch` holds this process's Dl
        # docs (= the full batch single-process); selection, history ids and
        # the OCR fan-out stay per-host, and `_process_work` assembles the
        # local rows into global device arrays.
        bb_mask = self._select(batch, epoch)              # (Dl, S) bool
        nl = bb_mask.size                                 # local strip rows
        flat_bb = bb_mask.reshape(nl)
        sel_rows = np.nonzero(flat_bb)[0]
        sel_ids = batch.strip_ids.reshape(nl)[sel_rows]
        if epoch_print:
            print(f"Total Samples - {int(batch.strip_mask.sum())}")
            print(f"OCR Samples - {len(sel_rows)}")
        for d in range(len(batch.doc_names)):
            for j in np.nonzero(bb_mask[d])[0]:
                if j < len(batch.strip_names[d]):
                    self.selected_samples.setdefault(
                        batch.strip_names[d][j],
                        [False] * cfg.epochs)[epoch] = True

        work = dict(batch=batch, images=images, bboxes=bboxes, strips=strips,
                    flat_bb=flat_bb, sel_rows=sel_rows, sel_ids=sel_ids,
                    clean=None, jitter=[])
        if cfg.inner_limit and len(sel_rows):
            # gather on device, fetch only the selected strips (host<->device
            # bandwidth is the bottleneck on tunneled TPUs); multi-process,
            # fetch this host's rows and index locally
            if self._pc == 1:
                sel_strips = np.asarray(strips[jnp.asarray(sel_rows)])
            else:
                sel_strips = self._fetch_rows(strips)[sel_rows]
            issue = self.ocr.submit if cfg.async_ocr else self.ocr.query
            if cfg.inner_limit_skip:
                with self.timer.time("ocr_issue"):
                    work["clean"] = issue(sel_strips)
            for _ in range(n_jitter):
                noisy = self._noise(sel_strips)
                with self.timer.time("ocr_issue"):
                    work["jitter"].append((noisy, issue(noisy)))
        return work

    @staticmethod
    def _resolve(res_or_future):
        return (res_or_future.result()
                if hasattr(res_or_future, "result") else res_or_future)

    def _process_work(self, work: dict, n_jitter: int, L: int,
                      W: int) -> dict:
        """Phase A (consuming OCR results) + phase B for one prepared batch."""
        cfg = self.cfg
        batch: DocBatch = work["batch"]
        strips = work["strips"]
        sel_rows = work["sel_rows"]
        sel_ids = work["sel_ids"]
        crnn_loss = 0.0
        crnn_updates = 0

        if cfg.inner_limit:
            strip_hw = strips.shape[2:]
            nl = len(batch.doc_names) * cfg.max_strips  # local strip rows
            hist_labels = np.full((nl, W, L), self.charmap.pad_id, np.int32)
            hist_lengths = np.zeros((nl, W), np.int32)
            hist_valid = np.zeros((nl, W), bool)
            if cfg.inner_limit_skip and work["clean"] is not None:
                with self.timer.time("ocr_wait"):
                    res = self._resolve(work["clean"])
                lw = self._gen_weights(sel_ids)     # pre-update history
                if cfg.weightgen_method == "decaying":
                    loss_weights = lw
                else:
                    full = np.zeros((nl, W + 1), np.float32)
                    full[sel_rows] = np.asarray(lw)
                    loss_weights = self._dev(full)
                self.history.add(sel_ids, res.labels, res.lengths, res.texts)
                labs, lens, valid = self.history.gather(sel_ids)
                hist_labels[sel_rows] = labs
                hist_lengths[sel_rows] = lens
                hist_valid[sel_rows] = valid
            elif cfg.weightgen_method == "decaying" or not cfg.inner_limit_skip:
                loss_weights = decaying_weights(cfg.decay_factor, W)
            else:
                # zero-selection batch under a per-sample weight generator
                # (e.g. a global bitmap missing every local doc): the
                # tracking loss is fully masked (hist_valid all False), but
                # the traced shape must stay (nl, W+1) — a (W,) fallback
                # would crash the trace single-process and diverge the
                # compiled programs across hosts multi-process.
                loss_weights = self._dev(np.zeros((nl, W + 1), np.float32))

            jitter_images = np.ones((n_jitter, nl, 1, *strip_hw), np.float32)
            jitter_labels = np.full((n_jitter, nl, L), self.charmap.pad_id,
                                    np.int32)
            jitter_lengths = np.zeros((n_jitter, nl), np.int32)
            for i, (noisy, pending) in enumerate(work["jitter"]):
                with self.timer.time("ocr_wait"):
                    res = self._resolve(pending)
                jitter_images[i, sel_rows] = noisy
                jitter_labels[i, sel_rows] = res.labels
                jitter_lengths[i, sel_rows] = res.lengths

            # fused phase A + B: one dispatch, no inter-phase host sync
            # (the reference boundary `train_nn_patch.py:309-312` carries
            # no host work here — OCR results were fetched above)
            with self.timer.time("phase_ab"):
                (self.prep_state, self.crnn_state, doc_out, metrics,
                 self.cer_table, self.ent_table, loss) = self.steps.phase_ab(
                    self.prep_state, self.crnn_state, work["images"],
                    work["bboxes"], self._dev(batch.strip_mask),
                    self._dev(batch.gt_labels),
                    self.cer_table, self.ent_table,
                    self._dev(batch.gt_lengths),
                    self._dev(batch.strip_ids),
                    strips, self._dev(work["flat_bb"]),
                    self._dev(hist_labels), self._dev(hist_lengths),
                    self._dev(hist_valid), loss_weights,
                    self._dev(jitter_images, dim=1),
                    self._dev(jitter_labels, dim=1),
                    self._dev(jitter_lengths, dim=1),
                    decaying=(cfg.weightgen_method == "decaying"),
                    inner_limit_skip=cfg.inner_limit_skip,
                    update_crnn=cfg.update_CRNN,
                    micro_steps=cfg.micro_steps,
                    micro_refresh=cfg.micro_refresh)
            crnn_loss = float(loss)
            crnn_updates = max(1, cfg.micro_steps)
        else:
            with self.timer.time("phase_b"):
                (self.prep_state, self.crnn_state, doc_out, metrics,
                 self.cer_table, self.ent_table) = self.steps.phase_b(
                    self.prep_state, self.crnn_state, work["images"],
                    work["bboxes"], self._dev(batch.strip_mask),
                    self._dev(batch.gt_labels),
                    self.cer_table, self.ent_table,
                    self._dev(batch.gt_lengths),
                    self._dev(batch.strip_ids),
                    update_crnn=cfg.update_CRNN,
                    micro_steps=cfg.micro_steps)

        if self.ema_params is not None:
            self.ema_params = self._ema_update(
                self.ema_params, self.prep_state.params)

        if cfg.minibatch_subset:
            # this host's rows only: all_cers bookkeeping is per-host
            # (documents are pinned to hosts, `parallel/multihost.py`)
            dl, S = len(batch.doc_names), cfg.max_strips
            cers_np = self._fetch_rows(metrics["cers"]).reshape(dl, S)
            for d in range(dl):
                for j in np.nonzero(batch.strip_mask[d])[0]:
                    name = batch.strip_names[d][j]
                    self.all_cers.setdefault(name, []).append(
                        float(cers_np[d, j]))

        return dict(loss=float(metrics["loss"]), crnn_loss=crnn_loss,
                    crnn_updates=crnn_updates, doc_out=doc_out, batch=batch)

    # ------------------------------------------------------------------
    def _global_select(self, epoch: int):
        cfg = self.cfg
        ct = self.cer_table
        if (self._pc > 1 and hasattr(ct, "sharding")
                and not ct.sharding.is_fully_replicated):
            # belt-and-braces: the tables re-enter each step replicated
            # (donation aliases the output buffer to the replicated input),
            # but if the partitioner ever leaves a data-sharded result,
            # np.asarray would raise on non-addressable shards — rebuild
            # the full table from per-process rows instead.
            from jax.experimental import multihost_utils

            from qea_ocr_tpu.parallel import local_rows
            cers = np.concatenate(
                list(multihost_utils.process_allgather(local_rows(ct))))
        else:
            cers = np.asarray(ct)
        num = max(1, int(round(
            (1 - cfg.minibatch_subset_prop) * self.dataset.num_strips)))
        fn = GLOBAL_METHODS[cfg.minibatch_subset]
        # dedicated per-epoch stream (not self._np_rng, whose state depends
        # on data-dependent noise draws): every process derives the SAME
        # global bitmap, so the epoch-level selection is truly global
        rng = np.random.default_rng((cfg.random_seed, 9173, epoch))
        self.global_bitmap = fn(rng, cers, num)

    # ------------------------------------------------------------------
    def _validate(self):
        cfg = self.cfg
        D = cfg.batch_docs
        agg = dict(crnn_crt=0.0, crnn_cer=0.0, ocr_crt=0.0, ocr_cer=0.0,
                   match_crt=0.0, match_cer=0.0, loss=0.0)
        label_count = 0
        doc_count = 0
        bb_calls_before = self.ocr.total_calls
        if self._pc == 1:
            for batch in batch_iterator(
                    self.validation_set, D, collate_docs,
                    shuffle=False, drop_last=False,
                    num_workers=default_num_workers(), prefetch=2):
                if batch.images.shape[0] != D:
                    # static shapes: pad the tail with mask-zero docs so
                    # every val document is scored (reference iterates them
                    # all, `train_nn_patch.py:366-398`)
                    batch = pad_docbatch(batch, D)
                nd, nlab = self._validate_batch(batch, agg)
                doc_count += nd
                label_count += nlab
        else:
            # multi-process: each global window of D val docs is split into
            # per-host Dl slices (same layout as training batches); hosts
            # whose slice is empty feed an all-padding batch so the jitted
            # lockstep holds. Metrics come out of GLOBAL masked reductions,
            # so every host returns identical numbers.
            Dl = self._dl
            template = None
            for start in range(0, self.val_set_size, D):
                window = np.arange(start, min(start + D, self.val_set_size))
                local_idx = window[self._pi * Dl:(self._pi + 1) * Dl]
                samples = [self.validation_set[int(i)] for i in local_idx]
                if samples:
                    batch = pad_docbatch(collate_docs(samples), Dl)
                    template = batch
                else:
                    if template is None:
                        template = pad_docbatch(
                            collate_docs([self.validation_set[0]]), Dl)
                    batch = blank_docbatch(template, Dl)
                nd, nlab = self._validate_batch(batch, agg)
                doc_count += nd
                label_count += nlab
        n_docs = max(1, doc_count)
        lc = max(1, label_count)
        print(f"Validation Dataset Calls - {label_count}")
        return dict(
            crnn_acc=agg["crnn_crt"] / lc,
            ocr_acc=agg["ocr_crt"] / lc,
            match_acc=agg["match_crt"] / lc,
            crnn_cer=agg["crnn_cer"] / n_docs,
            ocr_cer=agg["ocr_cer"] / n_docs,
            match_cer=agg["match_cer"] / n_docs,
            loss=agg["loss"] / n_docs,
            bb_calls=(self.ocr.total_calls - bb_calls_before
                      if self._pc == 1 else label_count),
        )

    def _validate_batch(self, batch: DocBatch, agg: dict):
        """Score one (local) validation batch into `agg`; returns the
        GLOBAL (real_docs, valid_strips) counts of the assembled batch."""
        cfg = self.cfg
        S = cfg.max_strips
        L = self.charmap.max_len
        nl = batch.strip_mask.size          # local strip rows
        dev_mask = self._dev(batch.strip_mask)
        doc_out, strips, dec, dec_len, loss = self.steps.val_forward(
            self._eval_prep_state(), self.crnn_state,
            self._dev(batch.images), self._dev(batch.bboxes),
            dev_mask, self._dev(batch.gt_labels),
            self._dev(batch.gt_lengths))
        flat_mask = self._dev(batch.strip_mask.reshape(nl))
        gt = self._dev(batch.gt_labels.reshape(nl, L))
        gt_len = self._dev(batch.gt_lengths.reshape(nl))
        # host OCR on this host's cleaned strips (costed:
        # train_val_bb_calls parity)
        rows = np.nonzero(batch.strip_mask.reshape(nl))[0]
        ocr_labels = np.full((nl, L), self.charmap.pad_id, np.int32)
        ocr_lengths = np.zeros((nl,), np.int32)
        if len(rows):
            if self._pc == 1:
                sel = np.asarray(strips[jnp.asarray(rows)])
            else:
                sel = self._fetch_rows(strips)[rows]
            res = self.ocr.query(sel)
            ocr_labels[rows] = res.labels
            ocr_lengths[rows] = res.lengths
        ocr_labels = self._dev(ocr_labels)
        ocr_lengths = self._dev(ocr_lengths)
        dec_c = dec[:, :L]
        dec_l = jnp.minimum(dec_len, L)
        crt, cer, _ = self._compare(dec_c, dec_l, gt, gt_len, flat_mask)
        t_crt, t_cer, _ = self._compare(
            ocr_labels, ocr_lengths, gt, gt_len, flat_mask)
        m_crt, m_cer, _ = self._compare(
            dec_c, dec_l, ocr_labels, ocr_lengths, flat_mask)
        # GLOBAL counts from the assembled mask (padded docs have no valid
        # strips; every real doc has >=1 — the dataset injects a dummy ' ')
        real_docs = int(jnp.sum(jnp.any(dev_mask, axis=1)))
        valid_strips = int(jnp.sum(flat_mask))
        agg["crnn_crt"] += float(crt); agg["crnn_cer"] += float(cer)
        agg["ocr_crt"] += float(t_crt); agg["ocr_cer"] += float(t_cer)
        agg["match_crt"] += float(m_crt); agg["match_cer"] += float(m_cer)
        # batch loss is a mean over the batch's real docs; x real_docs
        # recovers the per-doc sum so val_loss can use the reference's
        # /val_set_size denominator (`train_nn_patch.py:396`)
        agg["loss"] += float(loss) * real_docs
        return real_docs, valid_strips

    # ------------------------------------------------------------------
    def _save_side_jsons(self, epoch: int):
        # History/selection/CER side-state is host-LOCAL (documents are
        # pinned to hosts): under multiple processes each host writes its
        # own shard, suffixed .pN, and resume loads the matching shard.
        sfx = f".p{self._pi}" if self._pc > 1 else ""

        def _p(dirname, name):
            base, ext = os.path.splitext(name)
            return os.path.join(dirname, base + sfx + ext)

        self.history.save_json(
            _p(self.dirs.tracked_labels, f"tracked_labels_{epoch}.json"),
            self.dataset.id_to_name)
        self.history.save_json(
            _p(self.dirs.tracked_labels, "tracked_labels_current.json"),
            self.dataset.id_to_name)
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
