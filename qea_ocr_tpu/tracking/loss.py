"""Weighted CTC loss over label-history depths, one batched device call.

Counterpart of reference `weighted_ctc_loss` (`tracking_utils.py:59-75`),
which loops over history depths slicing ragged sub-batches. Here all
(B, window) targets fold into one (B*W,) CTC batch; masking handles sparsity.

Reduction parity:
  * "decaying": per depth i, scalar_weight_i x CTCLoss(mean) over the
    sub-batch valid at depth i (torch mean divides by target length);
  * otherwise: per-(sample, depth) weights x samplewise CTC (reference
    deliberately does NOT length-normalize here — `tracking_utils.py:73`
    TODO preserved for parity), averaged over the depth's sub-batch.
Depths with no valid samples contribute 0 (the reference simply skips them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qea_ocr_tpu.ops.ctc import ctc_loss_samplewise


def weighted_ctc_loss(
    scores: jax.Array,        # (T, B, V) log-probs
    hist_labels: jax.Array,   # (B, W, L) int32
    hist_lengths: jax.Array,  # (B, W) int32
    hist_valid: jax.Array,    # (B, W) bool
    loss_weights: jax.Array,  # (W,) for decaying, else (B, W+1)
    *,
    pad_id: int,
    decaying: bool,
    blank_id: int = 0,
) -> jax.Array:
    T, B, V = scores.shape
    W = hist_labels.shape[1]
    L = hist_labels.shape[2]

    # Fold depth into batch for one CTC evaluation.
    scores_rep = jnp.repeat(scores, W, axis=1)                  # (T, B*W, V)
    labels_f = hist_labels.reshape(B * W, L)
    lengths_f = hist_lengths.reshape(B * W)
    per = ctc_loss_samplewise(
        scores_rep, labels_f, lengths_f, pad_id=pad_id, blank_id=blank_id
    ).reshape(B, W)

    validf = hist_valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(validf, axis=0), 1.0)           # (W,)
    if decaying:
        lenf = jnp.maximum(hist_lengths.astype(jnp.float32), 1.0)
        per_norm = per / lenf                                    # torch-mean parity
        per_depth = jnp.sum(per_norm * validf, axis=0) / denom   # (W,)
        return jnp.sum(loss_weights[:W] * per_depth)
    else:
        # Depth/column pairing parity (`tracking_utils.py:74`
        # `loss_weights[img_indices, i]`): the weight matrix is generated
        # from the PRE-append history as [1 | w(h_0) ... w(h_{W-1})]
        # (`tracking_methods.py:81-83`), and depth 0 is the FRESHLY
        # appended OCR label — so depth i consumes column i: the fresh
        # label always carries the constant 1.0 (column 0) and history
        # slot j carries w(h_{j-1}); the last generated column goes
        # unused. (A 1-column shift here was caught by the verbatim
        # differential `test_weightgen_and_weighted_ctc_loss_differential`
        # — 23.4 vs the reference's 175.0 on identical inputs.)
        w = loss_weights[:, :W]                                  # (B, W)
        per_depth = jnp.sum(per * w * validf, axis=0) / denom
        return jnp.sum(per_depth)
