"""Jitted step functions for the patch/area preprocessor trainers.

The reference's two-phase algorithm (`train_nn_patch.py:225-345`) runs a
per-document Python loop with host OCR calls interleaved into autograd. The
TPU decomposition keeps one compiled program per phase and only the
black-box OCR on host:

  prep_extract   : UNet fwd (eval) + differentiable strip gather -> strips
  select         : budget selection kernel (see qea_ocr_tpu.selection)
  [host]         : OCR selected strips (async engine), history update
  phase_a        : CRNN update — weighted history CTC on clean strips +
                   jitter CTC on noisy strips, all folded into fixed-shape
                   masked batches (`train_nn_patch.py:278-309` semantics)
  phase_b        : prep update — CTC(GT) through the strip gather w/ frozen
                   CRNN batch stats + sec_loss_scalar * MSE(doc, white),
                   fused with the device CER/entropy table update
                   (`train_nn_patch.py:312-345` + `update_cer`)
  val_forward    : prep + strips + decode for the epoch validation loop

Shapes: D docs x S strip slots flatten to N = D*S strip rows; every ragged
quantity carries a mask. All functions are pure; trainers own the state.
"""

from __future__ import annotations

import os
from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from qea_ocr_tpu.ops.ctc import (
    ctc_loss_mean, ctc_loss_samplewise, greedy_decode)
from qea_ocr_tpu.ops.edit_distance import cer_from_labels
from qea_ocr_tpu.ops.entropy import mean_sequence_entropy
from qea_ocr_tpu.ops.text_stack import get_text_stack_batch
from qea_ocr_tpu.tracking.loss import weighted_ctc_loss
from qea_ocr_tpu.train.crnn_trainer import scrub_nonfinite


def _phase_a_batch_rows() -> int:
    """Max total strip rows (parts x N) for which phase A concatenates the
    history + jitter parts into one CRNN apply. Above this, separate
    applies (sequential activation reuse) keep the fused step inside HBM —
    measured: 4608 batched rows overflow a v5e by 4.5G at D=96, while
    quality-run batches (BATCH_DOCS<=32 -> <=1536 rows) fit comfortably.
    Override per-run with QEA_PHASE_A_BATCH_ROWS (0 disables batching)."""
    return int(os.environ.get("QEA_PHASE_A_BATCH_ROWS", "2048"))


def make_steps(prep_model, crnn_model, charmap, *, h_out=32, w_out=128,
               sec_loss_scalar=1.0, prep_eval_model=None):
    """`prep_eval_model`, when given, is a param-compatible twin of
    `prep_model` used for the NO-GRAD UNet forwards (prep_extract,
    val_forward). This is how alternate UNet compute layouts (e.g. the
    opt-in `QEA_CONV_IMPL=cmajor` Pallas path) enter training without
    touching the grad program — the cmajor grad at document batches OOMs
    (27.6G vs 15.75G HBM at D=96: saved padded-flat activations +
    custom-call layout copies), so only transient-activation forwards may
    reroute. Checkpoints are layout-independent (same param tree for
    every `conv_impl`)."""
    pad_id = charmap.pad_id
    max_len = charmap.max_len
    prep_eval = prep_eval_model if prep_eval_model is not None else prep_model

    def _per_doc_loss(scores, flat_labels, flat_lengths, strip_mask, doc_out):
        """Reference bs=1 loss weighting, batched: each DOCUMENT contributes
        CTC-mean-over-its-own-strips + sec_loss_scalar * MSE(doc, white),
        averaged over the batch's real docs (`train_nn_patch.py:324-328`).
        A strip-uniform batch mean would underweight strip-rich documents
        whenever strips-per-doc is ragged (real patch datasets); on uniform
        worlds the two are identical. Padded tail docs (all-False
        strip_mask) are excluded entirely."""
        D, S = strip_mask.shape
        N = D * S
        per = ctc_loss_samplewise(
            scores, flat_labels, flat_lengths, pad_id=pad_id)
        # torch CTCLoss(reduction='mean') length normalization
        per = per / jnp.maximum(1, flat_lengths).astype(per.dtype)
        m = strip_mask.reshape(D, S).astype(per.dtype)
        per_doc_ctc = (jnp.sum(per.reshape(D, S) * m, axis=1)
                       / jnp.maximum(1.0, jnp.sum(m, axis=1)))
        per_doc_mse = jnp.mean((doc_out - 1.0) ** 2, axis=(1, 2, 3))
        per_doc = per_doc_ctc + sec_loss_scalar * per_doc_mse
        doc_mask = jnp.any(strip_mask, axis=1).astype(per.dtype)
        return (jnp.sum(per_doc * doc_mask)
                / jnp.maximum(1.0, jnp.sum(doc_mask)))

    # ------------------------------------------------------------------
    @jax.jit
    def prep_extract(prep_state, images, bboxes):
        """UNet eval fwd + strip gather. Returns (doc_out (D,1,H,W),
        strips (N,1,h,w)) with N = D*S; gradients NOT needed here (phase A
        treats prep as frozen, `train_nn_patch.py:227`)."""
        doc_out = prep_eval.apply(prep_state.variables, images, train=False)
        strips = get_text_stack_batch(doc_out, bboxes, h_out, w_out)
        D, S = bboxes.shape[:2]
        strips = strips.reshape(D * S, 1, h_out, w_out)
        return doc_out, jax.lax.stop_gradient(strips)

    # ------------------------------------------------------------------
    def _phase_a_impl(crnn_state, strips, bb_mask,
                      hist_labels, hist_lengths, hist_valid, loss_weights,
                      jitter_images, jitter_labels, jitter_lengths,
                      *, decaying: bool, inner_limit_skip: bool):
        """CRNN (proxy) update.

        Args:
          strips: (N,1,h,w) prep-cleaned strips (stop-grad).
          bb_mask: (N,) bool — strips whose OCR labels arrived this step.
          hist_*: (N,W,...) label-history targets (valid already ∧ bb_mask).
          loss_weights: (W,) decaying scalars or (N,W+1) per-sample weights.
          jitter_images: (I,N,1,h,w) noisy strips (I = jitter inner loops,
            possibly 0); jitter_labels (I,N,L), jitter_lengths (I,N).

        Loss = [tracking weighted CTC if inner_limit_skip] + sum_i CTC_mean_i
        (gradient accumulation over the reference inner loop == sum of
        losses before a single optimizer step, `train_nn_patch.py:278-309`).
        """
        def loss_fn(params):
            total = 0.0
            variables = {"params": params, "batch_stats": crnn_state.batch_stats}
            I = jitter_images.shape[0]
            N = strips.shape[0]
            parts = ([strips] if inner_limit_skip else []) \
                + [jitter_images[i] for i in range(I)]
            # Phase A runs the proxy with frozen batch stats (train=False),
            # so ONE batched CRNN apply over [history strips; all jitter
            # copies] is numerically identical to separate applies while the
            # LSTM scans and conv ladder run once at (1+I)N rows — fewer
            # scan dispatches, fuller MXU tiles. BUT the batched apply holds
            # every part's conv activations live at once under grad: at the
            # D=96 production batch ((1+I)*1536 = 4608 rows) the fused-step
            # program overflows v5e HBM by 4.5G (20.24G vs 15.75G). Past
            # _phase_a_batch_rows() the parts therefore run as separate
            # applies, which XLA schedules sequentially, reusing the
            # activation buffers. Trace-time constant; no dynamic shapes.
            if len(parts) * N <= _phase_a_batch_rows():
                scores_all = crnn_model.apply(
                    variables, jnp.concatenate(parts, axis=0), train=False)
                # time-major (T, B, V): parts live on axis 1
                part_scores = [scores_all[:, j * N:(j + 1) * N]
                               for j in range(len(parts))]
            else:
                part_scores = [crnn_model.apply(variables, p, train=False)
                               for p in parts]
            k = 0
            if inner_limit_skip:
                total += weighted_ctc_loss(
                    part_scores[0], hist_labels, hist_lengths, hist_valid,
                    loss_weights, pad_id=pad_id, decaying=decaying)
                k = 1
            for i in range(I):
                total += ctc_loss_mean(
                    part_scores[k + i], jitter_labels[i], jitter_lengths[i],
                    pad_id=pad_id, sample_mask=bb_mask)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(crnn_state.params)
        grads = scrub_nonfinite(grads)
        new_state = crnn_state.apply_gradients(grads)
        return new_state, loss

    phase_a = jax.jit(_phase_a_impl,
                      static_argnames=("decaying", "inner_limit_skip"),
                      donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _phase_b_impl(prep_state, crnn_state, images, bboxes, strip_mask,
                      gt_labels, cer_table, ent_table, gt_lengths, strip_ids,
                      *, update_crnn: bool):
        """Preprocessor update + fused CER/entropy table update.

        prep runs in train mode (batch stats update); CRNN runs with FROZEN
        batch stats (`set_bn_eval` parity, `train_nn_patch.py:314`) but its
        params still receive gradients when `update_crnn`.

        Returns (new_prep, new_crnn, doc_out, metrics dict, new tables).
        """
        D, S = bboxes.shape[:2]
        N = D * S
        flat_mask = strip_mask.reshape(N)
        flat_labels = gt_labels.reshape(N, max_len)
        flat_lengths = gt_lengths.reshape(N)

        def loss_fn(prep_params, crnn_params):
            doc_out, prep_updates = prep_model.apply(
                {"params": prep_params, "batch_stats": prep_state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            strips = get_text_stack_batch(doc_out, bboxes, h_out, w_out)
            strips = strips.reshape(N, 1, h_out, w_out)
            scores = crnn_model.apply(
                {"params": crnn_params, "batch_stats": crnn_state.batch_stats},
                strips, train=False)   # frozen BN stats
            loss = _per_doc_loss(scores, flat_labels, flat_lengths,
                                 strip_mask, doc_out)
            return loss, (doc_out, scores, prep_updates["batch_stats"])

        (loss, (doc_out, scores, new_prep_bs)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            prep_state.params, crnn_state.params)
        prep_grads, crnn_grads = grads
        new_prep = prep_state.apply_gradients(
            scrub_nonfinite(prep_grads)).replace(batch_stats=new_prep_bs)
        if update_crnn:
            new_crnn = crnn_state.apply_gradients(scrub_nonfinite(crnn_grads))
        else:
            new_crnn = crnn_state

        # ---- device CER update (reference sampler.update_cer path) ----
        dec, dec_len = greedy_decode(scores, pad_id=pad_id)
        cers = cer_from_labels(
            dec[:, :max_len], jnp.minimum(dec_len, max_len),
            flat_labels, flat_lengths)                    # (N,)
        ids = strip_ids.reshape(N)
        safe_ids = jnp.where(flat_mask, ids, cer_table.shape[0])  # OOB drop
        new_cer_table = cer_table.at[safe_ids].set(cers, mode="drop")
        ents = mean_sequence_entropy(scores)              # (N,)
        new_ent_table = ent_table.at[safe_ids].set(ents, mode="drop")

        metrics = dict(loss=loss, cers=cers, decoded=dec, decoded_len=dec_len)
        return new_prep, new_crnn, doc_out, metrics, new_cer_table, new_ent_table

    # ------------------------------------------------------------------
    # Micro-stepping (sequential on-device chunks).
    #
    # The reference trains at bs=1 document — TRAIN_DOCS optimizer steps
    # per epoch (`train_nn_patch.py:37,193-467`) — while the batched TPU
    # step takes ONE prep/CRNN update per D-doc batch, which step-starves
    # the optimizers at equal epochs (measured: 82.0% vs 91.4% at D=8,
    # benchmarks/RESULTS.md "Reference-implementation quality parity").
    # `micro_steps=G` splits the D-doc batch into G sequential chunks
    # inside the SAME jitted program (`lax.scan`, body compiled once):
    # each chunk takes a full phase-A CRNN update and phase-B prep update,
    # recovering bs=D/G step dynamics at large-D amortization of the
    # per-batch host work (selection, OCR fan-out, history, dispatch).
    # The per-epoch query ledger is UNCHANGED (selection stays per-batch).
    # Chunking is doc-major, so chunk g owns docs [g*Dc, (g+1)*Dc) and
    # strip rows [g*Dc*S, (g+1)*Dc*S) — exactly the sub-batches a
    # batch_docs=D/G run would form from the same permutation.
    #
    # Known (documented) staleness: phase A consumes strips extracted ONCE
    # per batch with the batch-start prep params — chunk g's history/jitter
    # strips are up to g phase-B updates stale. This matches the labels
    # (the OCR read those very pixels) and the async-OCR pipeline's
    # existing one-step staleness contract.

    def _chunk(x, G):
        """(K, ...) -> (G, K/G, ...) doc-major chunking."""
        return x.reshape(G, x.shape[0] // G, *x.shape[1:])

    def _stack_metrics(ys):
        doc_out, loss_b, cers, dec, dec_len = ys
        D = doc_out.shape[0] * doc_out.shape[1]
        metrics = dict(
            loss=jnp.mean(loss_b),
            cers=cers.reshape(-1),
            decoded=dec.reshape(-1, dec.shape[-1]),
            decoded_len=dec_len.reshape(-1),
        )
        return doc_out.reshape(D, *doc_out.shape[2:]), metrics

    def _phase_b_micro(prep_state, crnn_state, images, bboxes, strip_mask,
                       gt_labels, cer_table, ent_table, gt_lengths,
                       strip_ids, *, update_crnn: bool, micro_steps: int):
        G = micro_steps
        xs = tuple(_chunk(a, G) for a in (
            images, bboxes, strip_mask, gt_labels, gt_lengths, strip_ids))

        def body(carry, x):
            prep_s, crnn_s, ct, et = carry
            im, bb, sm, gl, glen, sid = x
            prep_s, crnn_s, do, m, ct, et = _phase_b_impl(
                prep_s, crnn_s, im, bb, sm, gl, ct, et, glen, sid,
                update_crnn=update_crnn)
            return (prep_s, crnn_s, ct, et), (
                do, m["loss"], m["cers"], m["decoded"], m["decoded_len"])

        (prep_state, crnn_state, cer_table, ent_table), ys = jax.lax.scan(
            body, (prep_state, crnn_state, cer_table, ent_table), xs)
        doc_out, metrics = _stack_metrics(ys)
        return (prep_state, crnn_state, doc_out, metrics,
                cer_table, ent_table)

    def _phase_b_dispatch(prep_state, crnn_state, images, bboxes, strip_mask,
                          gt_labels, cer_table, ent_table, gt_lengths,
                          strip_ids, *, update_crnn: bool,
                          micro_steps: int = 1):
        if micro_steps <= 1:
            return _phase_b_impl(
                prep_state, crnn_state, images, bboxes, strip_mask,
                gt_labels, cer_table, ent_table, gt_lengths, strip_ids,
                update_crnn=update_crnn)
        return _phase_b_micro(
            prep_state, crnn_state, images, bboxes, strip_mask, gt_labels,
            cer_table, ent_table, gt_lengths, strip_ids,
            update_crnn=update_crnn, micro_steps=micro_steps)

    # donate model states + tables: params/opt-state buffers update in place
    # (trainers rebind both states right after each call, so the donated
    # inputs are never touched again host-side)
    phase_b = jax.jit(_phase_b_dispatch,
                      static_argnames=("update_crnn", "micro_steps"),
                      donate_argnums=(0, 1, 6, 7))

    # ------------------------------------------------------------------
    def _phase_ab_impl(prep_state, crnn_state, images, bboxes, strip_mask,
                       gt_labels, cer_table, ent_table, gt_lengths,
                       strip_ids, strips, bb_mask,
                       hist_labels, hist_lengths, hist_valid, loss_weights,
                       jitter_images, jitter_labels, jitter_lengths,
                       *, decaying: bool, inner_limit_skip: bool,
                       update_crnn: bool):
        """Fused phase A + phase B: one XLA program per training batch.

        The reference's inter-phase boundary (`train_nn_patch.py:309-312`)
        has no host work in this decomposition (the OCR fetch happens
        before phase A), so fusing removes a dispatch + host sync per batch
        and lets XLA overlap phase-A tail collectives with phase-B head
        compute. Phase B sees the phase-A-updated CRNN, exactly like the
        sequential calls.
        """
        new_crnn, loss_a = _phase_a_impl(
            crnn_state, strips, bb_mask, hist_labels, hist_lengths,
            hist_valid, loss_weights, jitter_images, jitter_labels,
            jitter_lengths, decaying=decaying,
            inner_limit_skip=inner_limit_skip)
        out = _phase_b_impl(
            prep_state, new_crnn, images, bboxes, strip_mask, gt_labels,
            cer_table, ent_table, gt_lengths, strip_ids,
            update_crnn=update_crnn)
        return out + (loss_a,)

    def _phase_ab_micro(prep_state, crnn_state, images, bboxes, strip_mask,
                        gt_labels, cer_table, ent_table, gt_lengths,
                        strip_ids, strips, bb_mask,
                        hist_labels, hist_lengths, hist_valid, loss_weights,
                        jitter_images, jitter_labels, jitter_lengths,
                        *, decaying: bool, inner_limit_skip: bool,
                        update_crnn: bool, micro_steps: int,
                        micro_refresh: bool = False):
        """G sequential (phase A -> phase B) chunk updates per dispatch —
        the reference's per-small-batch interleave (`train_nn_patch.py:
        225-345` at bs=1) at D-batch amortization; see the micro-stepping
        note above.

        `micro_refresh=True` re-extracts chunk g's phase-A history strips
        from the CURRENT prep (one extra UNet eval forward per chunk)
        instead of consuming the batch-start extraction. This mirrors the
        reference exactly: its tracking round runs the CRNN on freshly
        cleaned strips against the tracked label HISTORY (labels from past
        reads of older pixel versions — the history mechanism is built on
        stale labels, `train_nn_patch.py:278-294`), so fresh pixels +
        tracked history is the faithful pairing. The jitter round keeps the
        batch-start noisy pixels WITH their matching OCR reads (consistent
        pairs, one-batch staleness — the async-OCR contract). Measured:
        without refresh, chunk-1 micro-stepping (G=batch) diverges — the
        prep moves G updates within a batch while phase A still trains the
        proxy on pixels from update 0."""
        G = micro_steps
        doc_xs = tuple(_chunk(a, G) for a in (
            images, bboxes, strip_mask, gt_labels, gt_lengths, strip_ids))
        strip_xs = tuple(_chunk(a, G) for a in (
            strips, bb_mask, hist_labels, hist_lengths, hist_valid))
        if decaying:
            # (W,) scalars shared by every chunk
            lw_xs = jnp.broadcast_to(
                loss_weights, (G, *loss_weights.shape))
        else:
            lw_xs = _chunk(loss_weights, G)          # (G, Nc, W+1)
        # jitter stacks are (I, N, ...): split the strip-row axis, then put
        # the chunk axis first for the scan
        jit_xs = tuple(
            jnp.swapaxes(
                a.reshape(a.shape[0], G, a.shape[1] // G, *a.shape[2:]),
                0, 1)
            for a in (jitter_images, jitter_labels, jitter_lengths))

        def body(carry, x):
            prep_s, crnn_s, ct, et = carry
            (im, bb, sm, gl, glen, sid), (st, bbm, hl, hlen, hv), lw, \
                (ji, jl, jlen) = x
            if micro_refresh:
                doc_eval = prep_eval.apply(prep_s.variables, im, train=False)
                st = jax.lax.stop_gradient(
                    get_text_stack_batch(doc_eval, bb, h_out, w_out)
                    .reshape(st.shape))
            crnn_s, loss_a = _phase_a_impl(
                crnn_s, st, bbm, hl, hlen, hv, lw, ji, jl, jlen,
                decaying=decaying, inner_limit_skip=inner_limit_skip)
            prep_s, crnn_s, do, m, ct, et = _phase_b_impl(
                prep_s, crnn_s, im, bb, sm, gl, ct, et, glen, sid,
                update_crnn=update_crnn)
            return (prep_s, crnn_s, ct, et), (
                do, m["loss"], m["cers"], m["decoded"], m["decoded_len"],
                loss_a)

        (prep_state, crnn_state, cer_table, ent_table), ys = jax.lax.scan(
            body, (prep_state, crnn_state, cer_table, ent_table),
            (doc_xs, strip_xs, lw_xs, jit_xs))
        doc_out, metrics = _stack_metrics(ys[:5])
        return (prep_state, crnn_state, doc_out, metrics,
                cer_table, ent_table, jnp.mean(ys[5]))

    def _phase_ab_dispatch(prep_state, crnn_state, images, bboxes,
                           strip_mask, gt_labels, cer_table, ent_table,
                           gt_lengths, strip_ids, strips, bb_mask,
                           hist_labels, hist_lengths, hist_valid,
                           loss_weights, jitter_images, jitter_labels,
                           jitter_lengths, *, decaying: bool,
                           inner_limit_skip: bool, update_crnn: bool,
                           micro_steps: int = 1, micro_refresh: bool = False):
        args = (prep_state, crnn_state, images, bboxes, strip_mask,
                gt_labels, cer_table, ent_table, gt_lengths, strip_ids,
                strips, bb_mask, hist_labels, hist_lengths, hist_valid,
                loss_weights, jitter_images, jitter_labels, jitter_lengths)
        if micro_steps <= 1:
            return _phase_ab_impl(
                *args, decaying=decaying,
                inner_limit_skip=inner_limit_skip, update_crnn=update_crnn)
        return _phase_ab_micro(
            *args, decaying=decaying, inner_limit_skip=inner_limit_skip,
            update_crnn=update_crnn, micro_steps=micro_steps,
            micro_refresh=micro_refresh)

    phase_ab = jax.jit(
        _phase_ab_dispatch,
        static_argnames=("decaying", "inner_limit_skip", "update_crnn",
                         "micro_steps", "micro_refresh"),
        donate_argnums=(0, 1, 6, 7))

    # ------------------------------------------------------------------
    @partial(jax.jit, donate_argnums=(0,))
    def prep_pretrain_step(prep_state, images):
        """Identity/denoise pretraining: MSE(prep(x), x). Gives the
        preprocessor a readable starting point before the budget loop (the
        reference reaches the same state by loading a --prep_model
        checkpoint from a prior run)."""
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

    # ------------------------------------------------------------------
    @jax.jit
    def val_forward(prep_state, crnn_state, images, bboxes, strip_mask,
                    gt_labels, gt_lengths):
        """Validation fwd: cleaned doc, strips (for host OCR), CRNN decode,
        and the prep loss (CTC(GT) + MSE) — reference `train_nn_patch.py:366-374`."""
        D, S = bboxes.shape[:2]
        N = D * S
        doc_out = prep_eval.apply(prep_state.variables, images, train=False)
        strips = get_text_stack_batch(doc_out, bboxes, h_out, w_out)
        strips = strips.reshape(N, 1, h_out, w_out)
        scores = crnn_model.apply(crnn_state.variables, strips, train=False)
        # per-doc weighting over REAL docs only: tail batches arrive padded
        # with mask-zero docs (pad_docbatch); every real doc has >=1 valid
        # strip (the dataset injects a dummy ' ' strip).
        loss = _per_doc_loss(scores, gt_labels.reshape(N, max_len),
                             gt_lengths.reshape(N), strip_mask, doc_out)
        dec, dec_len = greedy_decode(scores, pad_id=pad_id)
        return doc_out, strips, dec, dec_len, loss

    # ------------------------------------------------------------------
    @jax.jit
    def entropy_of(crnn_state, strips):
        scores = crnn_model.apply(crnn_state.variables, strips, train=False)
        return mean_sequence_entropy(scores)

    return SimpleNamespace(
        prep_extract=prep_extract,
        phase_a=phase_a,
        phase_b=phase_b,
        phase_ab=phase_ab,
        prep_pretrain_step=prep_pretrain_step,
        val_forward=val_forward,
        entropy_of=entropy_of,
    )
