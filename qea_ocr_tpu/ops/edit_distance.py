"""Batched Levenshtein distance / CER entirely on device.

The reference computes CER with the `python-Levenshtein` C extension in a
per-sample host loop (`utils.py:95-110`). Here the whole batch runs as one
jitted DP so CER feeds selection/tracking without leaving the device.

Algorithm: classic row-DP, rows driven by `lax.scan`; the within-row
left-to-right dependency is resolved with the min-plus prefix trick:

    new[j] = min(prev[j] + 1, prev[j-1] + cost_j, min_{k<j}(new[k] + j - k))
           = j + cummin_k<=j ( d[k] - k ),  d[j] = min(prev[j]+1, prev[j-1]+cost_j)

so every row is a vectorized cummin over the lane axis, batched over B.
Complexity O(L1) scan steps of O(B*L2) vector work — MXU-free but VPU-dense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batched_levenshtein(
    a: jax.Array,
    a_len: jax.Array,
    b: jax.Array,
    b_len: jax.Array,
) -> jax.Array:
    """Edit distance between int sequences, batched.

    Args:
      a: (B, L1) int32 (padding values are ignored via `a_len`).
      a_len: (B,) int32.
      b: (B, L2) int32.
      b_len: (B,) int32.

    Returns: (B,) int32 Levenshtein distances.
    """
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    B, L1 = a.shape
    L2 = b.shape[1]
    j = jnp.arange(L2 + 1, dtype=jnp.int32)  # (L2+1,)

    # row_0[j] = j, but positions beyond b_len are irrelevant (masked at end).
    row0 = jnp.broadcast_to(j, (B, L2 + 1)).astype(jnp.int32)

    def step(carry, i):
        prev = carry  # (B, L2+1)
        ai = a[:, i]  # (B,)
        # cost[j] for j>=1 compares a[i] with b[j-1]
        cost = (b != ai[:, None]).astype(jnp.int32)  # (B, L2)
        # d[j] = min(prev[j] + 1 (deletion), prev[j-1] + cost (sub/match))
        d = jnp.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)  # (B, L2)
        # boundary j=0: new[0] = i+1
        d_full = jnp.concatenate([(i + 1)[None].repeat(B)[:, None], d], axis=1)
        # new[j] = j + cummin_{k<=j}(d_full[k] - k)   (insertion closure)
        shifted = d_full - j[None, :]
        run = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        new = run + j[None, :]
        # Rows past a_len must not advance: keep prev there.
        active = (i < a_len)[:, None]
        new = jnp.where(active, new, prev)
        return new, None

    last, _ = jax.lax.scan(step, row0, jnp.arange(L1, dtype=jnp.int32))
    # Answer is at column b_len for each sample.
    return jnp.take_along_axis(last, b_len[:, None].astype(jnp.int32), axis=1)[:, 0]


def cer_from_labels(
    pred: jax.Array,
    pred_len: jax.Array,
    gt: jax.Array,
    gt_len: jax.Array,
) -> jax.Array:
    """Per-sample CER = levenshtein(gt, pred) / max(1, len(gt)).

    Parity with reference `compare_labels` (`utils.py:95-110`).
    Returns (B,) float32.
    """
    dist = batched_levenshtein(pred, pred_len, gt, gt_len)
    return dist.astype(jnp.float32) / jnp.maximum(gt_len.astype(jnp.float32), 1.0)


def compare_labels_device(
    pred: jax.Array,
    pred_len: jax.Array,
    gt: jax.Array,
    gt_len: jax.Array,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Device equivalent of reference `compare_labels` over a batch.

    Returns (correct_count scalar, total_cer scalar, per_sample_cer (B,)).
    Exact match == identical lengths and identical symbols up to gt_len.
    """
    B, Lp = pred.shape
    Lg = gt.shape[1]
    L = max(Lp, Lg)
    pad_p = jnp.pad(pred, ((0, 0), (0, L - Lp)), constant_values=-1)
    pad_g = jnp.pad(gt, ((0, 0), (0, L - Lg)), constant_values=-2)
    pos = jnp.arange(L)[None, :]
    vp = pos < pred_len[:, None]
    vg = pos < gt_len[:, None]
    same = jnp.where(vg | vp, (pad_p == pad_g) & (vp == vg), True)
    exact = jnp.all(same, axis=1) & (pred_len == gt_len)
    cer = cer_from_labels(pred, pred_len, gt, gt_len)
    if mask is not None:
        m = mask.astype(jnp.float32)
        exact_f = exact.astype(jnp.float32) * m
        cer_sum = jnp.sum(cer * m)
    else:
        exact_f = exact.astype(jnp.float32)
        cer_sum = jnp.sum(cer)
    return jnp.sum(exact_f), cer_sum, cer
