"""Query-budget selection strategies, vectorized for TPU.

Counterpart of reference `selection_utils.py:61-229`. The reference samplers
are host-side classes looping over python lists per document. Here every
per-batch strategy is expressed as one jittable kernel that assigns each
strip slot a **priority rank** (0 = selected first); the trainer then takes
`rank < k_d` where `k_d = max(1, ceil(n_valid * (1 - prop)))` per document
(budget formula parity with `train_nn_patch.py:255-256`). That turns dynamic
"pick k of n" into static-shape masking, so selection lives inside the
compiled train step — no host round trip.

Strategies (factory-name parity with `selection_utils.py:220-229`):
  * random         — uniform-noise ranks (== randperm prefix)
  * topKCER        — rank by descending CER
  * rangeCER       — uniform points over [min,max] CER; each point claims the
                     nearest unclaimed strip (claimed -> sentinel 100.0, the
                     reference's sentinel, `selection_utils.py:134`)
  * uniformEntropy — rangeCER's kernel over mean CRNN output entropy
  * uniformCERglobal / randomglobal — epoch-level global selection over the
                     full CER table; per batch the mask is membership.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL = 100.0
_BIG_RANK = 10 ** 6


def _ranks_from_scores(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Lower score -> earlier rank; invalid slots get huge ranks.

    scores: (S,) float; valid: (S,) bool. Returns (S,) int32 ranks.
    """
    masked = jnp.where(valid, scores, jnp.inf)
    order = jnp.argsort(masked)                      # slot ids, best first
    S = scores.shape[0]
    ranks = jnp.zeros((S,), jnp.int32).at[order].set(jnp.arange(S, dtype=jnp.int32))
    return jnp.where(valid, ranks, _BIG_RANK)


def random_ranks(key: jax.Array, estimates: jax.Array, valid: jax.Array) -> jax.Array:
    """Uniform random priority (reference RandomSampler, randperm prefix)."""
    noise = jax.random.uniform(key, estimates.shape)
    return _ranks_from_scores(noise, valid)


def topk_cer_ranks(key: jax.Array, estimates: jax.Array, valid: jax.Array) -> jax.Array:
    """Highest-CER-first (reference TopKCERSampler, argsort descending)."""
    return _ranks_from_scores(-estimates, valid)


def range_ranks(key: jax.Array, estimates: jax.Array, valid: jax.Array) -> jax.Array:
    """CER-range-coverage priority (reference CerRangeSampler).

    Draws S uniform points in [min, max] of the valid estimates; point i
    claims the nearest unclaimed slot (claimed slots become the sentinel
    100.0, preserving the reference's re-claimable-near-100 quirk).
    """
    S = estimates.shape[0]
    est = jnp.where(valid, estimates, jnp.inf)
    lo = jnp.min(jnp.where(valid, estimates, jnp.inf))
    hi = jnp.max(jnp.where(valid, estimates, -jnp.inf))
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    points = lo + (hi - lo) * jax.random.uniform(key, (S,))

    def step(est_c, i):
        idx = jnp.argmin(jnp.abs(points[i] - est_c))
        est_c = est_c.at[idx].set(_SENTINEL)
        return est_c, idx

    _, claimed = jax.lax.scan(step, est, jnp.arange(S))
    ranks = jnp.full((S,), _BIG_RANK, jnp.int32)
    # A slot can be claimed twice when estimates sit near the 100.0 sentinel
    # (a claimed slot's estimate IS the sentinel, so a later point near 100
    # re-claims it — the reference's re-claimable quirk shrinks the picked
    # set, `selection_utils.py:127-134`). Scatter with min-combine so the
    # FIRST (best) claim provably wins regardless of XLA's undefined
    # duplicate-index winner order; later duplicate ranks go unused, which
    # matches the reference's smaller effective pick set.
    ranks = ranks.at[claimed].min(jnp.arange(S, dtype=jnp.int32))
    return jnp.where(valid, ranks, _BIG_RANK)


RANK_KERNELS: Dict[str, Callable] = {
    "random": random_ranks,
    "topKCER": topk_cer_ranks,
    "rangeCER": range_ranks,
    "uniformEntropy": range_ranks,   # same kernel; estimates = entropies
}


@partial(jax.jit, static_argnames=("method",))
def select_batch(
    method: str,
    key: jax.Array,
    estimates: jax.Array,
    valid: jax.Array,
    prop: jax.Array | float,
) -> tuple[jax.Array, jax.Array]:
    """Per-document budget selection for a batch of documents.

    Args:
      estimates: (D, S) per-strip CER (or entropy) estimates.
      valid: (D, S) bool strip-slot validity.
      prop: scalar fraction of samples NOT to query (minibatch_subset_prop).

    Returns:
      bb_mask: (D, S) bool — strips that query the black box this step.
      k: (D,) int32 — per-document query count max(1, ceil(n_valid*(1-prop))).
    """
    kernel = RANK_KERNELS[method]
    D = estimates.shape[0]
    keys = jax.random.split(key, D)
    ranks = jax.vmap(kernel)(keys, estimates, valid)   # (D, S)
    n_valid = jnp.sum(valid, axis=1).astype(jnp.float32)
    k = jnp.maximum(1, jnp.ceil(n_valid * (1.0 - prop))).astype(jnp.int32)
    k = jnp.minimum(k, n_valid.astype(jnp.int32))
    k = jnp.maximum(k, jnp.where(n_valid > 0, 1, 0))
    bb_mask = ranks < k[:, None]
    return bb_mask, k


def membership_mask(strip_ids: jax.Array, member_bitmap: jax.Array) -> jax.Array:
    """Global-selection batch mask: strip selected iff its stable id is in
    the epoch's member set (reference Uniform/RandomSamplerGlobal.query
    intersects batch names with `selected_samplenames`)."""
    return member_bitmap[strip_ids]


# ---------------------------------------------------------------------------
# Epoch-level (global) selection over the full CER table — host side, runs
# once per epoch like the reference's `select_samples()`
# (`train_nn_patch.py:206-209`).
# ---------------------------------------------------------------------------
def select_global_uniform(
    rng: np.random.Generator, cers: np.ndarray, num_samples: int
) -> np.ndarray:
    """Quantile-bucketed global pick: sort all CERs, split into num_samples
    buckets, pick one uniformly per bucket. Returns a bool member bitmap."""
    n = cers.shape[0]
    bitmap = np.zeros(n, dtype=bool)
    order = np.argsort(cers)
    for split in np.array_split(order, max(1, num_samples)):
        if split.size:
            bitmap[rng.choice(split)] = True
    return bitmap


def select_global_random(
    rng: np.random.Generator, cers: np.ndarray, num_samples: int
) -> np.ndarray:
    """Plain global random sample of strip ids. Returns a bool bitmap."""
    n = cers.shape[0]
    bitmap = np.zeros(n, dtype=bool)
    chosen = rng.choice(n, size=min(num_samples, n), replace=False)
    bitmap[chosen] = True
    return bitmap


GLOBAL_METHODS = {
    "uniformCERglobal": select_global_uniform,
    "randomglobal": select_global_random,
}

ALL_METHODS = tuple(RANK_KERNELS) + tuple(GLOBAL_METHODS)


def is_global(method: str | None) -> bool:
    """The reference checks `"global" in selection_method`
    (`train_nn_patch.py:206-208`)."""
    return bool(method) and "global" in method
