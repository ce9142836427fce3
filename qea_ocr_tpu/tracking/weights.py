"""Loss-weight generators over label history, vectorized on device.

Counterpart of reference `label_tracking/tracking_methods.py:12-124`. All
generators produce `(B, window+1)` float32 weights whose column 0 (current
epoch's fresh OCR label) is fixed at 1.0, matching the reference convention
(`tracking_methods.py:49,85`).

  * decaying    — closed-form [decay^0 .. decay^(W-1)], shape (W,)
                  (`tracking_methods.py:105-115`; the reference uses these as
                  per-depth scalars, not per-sample)
  * levenshtein — consensus weighting: slots whose label agrees with the
                  rest of the history get weight near 0.5, outliers near 0
                  (`tracking_methods.py:63-101`); pairwise distances run as
                  one batched device DP instead of a host double loop
  * self_attention — HistoryAttention module applied batched over all strips
                  (`tracking_methods.py:26-59`)
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from qea_ocr_tpu.ops.edit_distance import batched_levenshtein


def decaying_weights(decay_factor: float, window_size: int) -> jax.Array:
    """(W,) per-depth scalars."""
    return jnp.asarray([decay_factor ** i for i in range(window_size)], jnp.float32)


@partial(jax.jit, static_argnames=())
def levenshtein_weights(
    hist_labels: jax.Array,   # (B, W, L) int32
    hist_lengths: jax.Array,  # (B, W) int32
    hist_valid: jax.Array,    # (B, W) bool
) -> jax.Array:
    """(B, W+1) consensus weights.

    For each valid slot i: w = 0.5 * (1 - min(mean_dist_i, len_i)/len_i)
    where mean_dist_i averages Levenshtein distance to every *other* slot in
    the (possibly shorter-than-W) history, divided by max(hist_len-1, 1).
    """
    B, W, L = hist_labels.shape
    # Pairwise distances between all slot pairs, batched: flatten (B, W, W)
    a = jnp.repeat(hist_labels, W, axis=1).reshape(B * W * W, L)
    a_len = jnp.repeat(hist_lengths, W, axis=1).reshape(B * W * W)
    b = jnp.tile(hist_labels, (1, W, 1)).reshape(B * W * W, L)
    b_len = jnp.tile(hist_lengths, (1, W)).reshape(B * W * W)
    dists = batched_levenshtein(a, a_len, b, b_len).reshape(B, W, W).astype(jnp.float32)

    validf = hist_valid.astype(jnp.float32)
    pair_valid = validf[:, :, None] * validf[:, None, :]
    eye = jnp.eye(W)[None]
    pair_valid = pair_valid * (1.0 - eye)  # exclude self
    hist_len = jnp.sum(validf, axis=1, keepdims=True)       # (B, 1)
    num_elements = jnp.maximum(hist_len - 1.0, 1.0)          # (B, 1)
    dist_sum = jnp.sum(dists * pair_valid, axis=2)           # (B, W)
    dist_mean = dist_sum / num_elements
    num_chars = jnp.maximum(hist_lengths.astype(jnp.float32), 1.0)
    w = 0.5 * (1.0 - jnp.minimum(dist_mean, num_chars) / num_chars)
    w = w * validf
    ones = jnp.ones((B, 1), jnp.float32)
    return jnp.concatenate([ones, w], axis=1)


def attention_weights(
    attention_apply: Callable,
    attn_variables,
    hist_labels: jax.Array,   # (B, W, L)
    hist_valid: jax.Array,    # (B, W)
) -> jax.Array:
    """(B, W+1) attention-generated weights; invalid slots zeroed."""
    B = hist_labels.shape[0]
    w = attention_apply(attn_variables, hist_labels)  # (B, W)
    w = w * hist_valid.astype(jnp.float32)
    ones = jnp.ones((B, 1), jnp.float32)
    return jnp.concatenate([ones, w], axis=1)


WEIGHTGEN_METHODS = ("decaying", "levenshtein", "self_attention")


def weightgenerator_factory(method: str):
    """Name check parity with `tracking_methods.py:118-124`; the trainers
    dispatch on the returned name (functional generators, not classes)."""
    if method not in WEIGHTGEN_METHODS:
        raise KeyError(method)
    return method
