"""CTC loss and greedy decoding, vectorized for TPU.

Counterparts of:
  * reference `utils.py:74-92` (`pred_to_string`, per-sample Python argmax
    loop) -> `greedy_decode`, a fully batched collapse on device;
  * `torch.nn.CTCLoss()` (reduction='mean') as used at
    `train_nn_patch.py:143` -> `ctc_loss_mean`, with torch's
    divide-by-target-length-then-batch-mean semantics reproduced exactly;
  * `torch.nn.CTCLoss(reduction='none')` (`train_nn_area.py:147`) ->
    `ctc_loss_samplewise`.

Conventions: scores are time-major log-probs `(T, B, V)` like the reference
CRNN output; labels are `(B, L)` int32 padded with `pad_id` (== vocab_size);
`blank_id` is 0.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax

# CTC backend: "auto" (Pallas kernels on TPU, optax elsewhere), "optax"
# (XLA-fused lax.scan), or "pallas" (custom alpha/beta recursion kernels,
# `ops/pallas/ctc_pallas.py`). Measured on one v5e chip at production
# shapes (T=31, B=512, V=95, L=100, fwd+bwd): pallas 1.19 ms vs optax
# 1.64 ms (~1.4x faster with the time-major kernel layout). Numerical soak
# vs optax: property sweep over shapes/seeds incl. degenerate labels
# (empty, repeated-char, infeasible 2L+1 > T) in tests/test_pallas_ctc.py,
# plus an end-to-end quality pipeline at QEA_CTC_IMPL=pallas
# (benchmarks/RESULTS.md) — default-on for TPU since round 2. The env var
# is read at TRACE time (same contract as QEA_GATHER_IMPL).
def _use_pallas_ctc() -> bool:
    impl = os.environ.get("QEA_CTC_IMPL", "auto")
    if impl == "pallas":
        return True
    return impl == "auto" and jax.default_backend() == "tpu"


def _to_batch_major(scores: jax.Array) -> jax.Array:
    # (T, B, V) -> (B, T, V)
    return jnp.transpose(scores, (1, 0, 2))


def ctc_loss_samplewise(
    scores: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    *,
    pad_id: int,
    blank_id: int = 0,
    logit_lengths: jax.Array | None = None,
) -> jax.Array:
    """Per-sample CTC negative log-likelihood.

    Args:
      scores: (T, B, V) log-probabilities (log_softmax output; optax's
        internal log_softmax is idempotent on these).
      labels: (B, L) int32, padded with `pad_id`.
      label_lengths: (B,) int32 true label lengths.
      logit_lengths: optional (B,) int32 valid timesteps; default all T.

    Returns: (B,) float32 losses (NLL, not length-normalized).
    """
    if _use_pallas_ctc() and logit_lengths is None:
        from qea_ocr_tpu.ops.pallas.ctc_pallas import ctc_loss_pallas
        return ctc_loss_pallas(
            scores.astype(jnp.float32), labels, label_lengths, pad_id, blank_id)
    logits = _to_batch_major(scores).astype(jnp.float32)
    B, T, _ = logits.shape
    L = labels.shape[1]
    if logit_lengths is None:
        logit_paddings = jnp.zeros((B, T), dtype=jnp.float32)
    else:
        t_idx = jnp.arange(T)[None, :]
        logit_paddings = (t_idx >= logit_lengths[:, None]).astype(jnp.float32)
    l_idx = jnp.arange(L)[None, :]
    label_paddings = (l_idx >= label_lengths[:, None]).astype(jnp.float32)
    # optax requires labels to be valid class ids even where padded.
    safe_labels = jnp.where(labels == pad_id, 0, labels).astype(jnp.int32)
    per_seq = optax.ctc_loss(
        logits, logit_paddings, safe_labels, label_paddings, blank_id=blank_id
    )
    return per_seq


def ctc_loss_mean(
    scores: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    *,
    pad_id: int,
    blank_id: int = 0,
    logit_lengths: jax.Array | None = None,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """torch `CTCLoss(reduction='mean')` parity: mean over batch of
    `nll_b / max(1, label_len_b)`, restricted to `sample_mask` when given.
    """
    per_seq = ctc_loss_samplewise(
        scores, labels, label_lengths,
        pad_id=pad_id, blank_id=blank_id, logit_lengths=logit_lengths,
    )
    denom = jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
    normed = per_seq / denom
    if sample_mask is None:
        return jnp.mean(normed)
    m = sample_mask.astype(jnp.float32)
    return jnp.sum(normed * m) / jnp.maximum(jnp.sum(m), 1.0)


def greedy_decode(
    scores: jax.Array,
    *,
    pad_id: int,
    blank_id: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Batched greedy CTC decode: argmax per step, collapse repeats, drop blank.

    Semantics parity with reference `pred_to_string` (`utils.py:74-92`), which
    keeps step t iff argmax_t != blank and argmax_t != argmax_{t-1}.

    Args:
      scores: (T, B, V) log-probs (any monotone scores work).

    Returns:
      decoded: (B, T) int32 label ids, pad-filled with `pad_id`.
      lengths: (B,) int32 decoded lengths.
    """
    T = scores.shape[0]
    ids = jnp.argmax(scores, axis=-1).T  # (B, T)
    prev = jnp.concatenate(
        [jnp.full_like(ids[:, :1], blank_id), ids[:, :-1]], axis=1
    )
    keep = (ids != blank_id) & (ids != prev)  # (B, T)
    # Compact kept symbols to the front: scatter each kept symbol at its
    # running rank; dropped symbols scatter out-of-bounds (mode='drop').
    new_pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # (B, T)
    new_pos = jnp.where(keep, new_pos, T)  # OOB for dropped
    out = jnp.full_like(ids, pad_id)

    def scatter_row(out_row, pos_row, id_row):
        return out_row.at[pos_row].set(id_row, mode="drop")

    decoded = jax.vmap(scatter_row)(out, new_pos, ids)
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return decoded, lengths
