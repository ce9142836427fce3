"""Prediction-entropy estimates used by the `uniformEntropy` selection
strategy. Parity with reference `calc_entropy`/`update_entropies`
(`selection_utils.py:10-27`), batched on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalized_entropy(probs: jax.Array, num_classes: int) -> jax.Array:
    """Entropy of each distribution, normalized by log(num_classes).

    Args:
      probs: (..., V) probabilities.
    Returns: (...) normalized entropies.
    """
    e_term = 1e-6
    log_prob = jnp.log(probs + e_term)
    entropy = -jnp.sum(probs * log_prob, axis=-1)
    return entropy / jnp.log(jnp.asarray(num_classes, dtype=probs.dtype))


def mean_sequence_entropy(scores: jax.Array, num_classes: int | None = None) -> jax.Array:
    """Mean per-timestep normalized entropy of CRNN outputs.

    Args:
      scores: (T, B, V) log-probs.
    Returns: (B,) mean normalized entropy per sample.
    """
    if num_classes is None:
        num_classes = scores.shape[-1]
    probs = jnp.exp(scores)
    ents = normalized_entropy(probs, num_classes)  # (T, B)
    return jnp.mean(ents, axis=0)
