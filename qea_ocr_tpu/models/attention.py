"""HistoryAttention: self-attention loss-weight generator over label history.

Parity with reference `models/model_attention.py:7-38`: a (vocab_size+1,
emb) char embedding table with zeroed pad row (frozen by default), mean-pool
characters to word embeddings, add learned positional encodings over the
history window, score with softmax(QQ^T/sqrt(Dq)), then a Linear(window->1)
with sigmoid/softmax/relu-normalize to per-slot weights.

TPU-first: runs batched over all strips at once — input is
(B, window, max_char_len) char indices, output (B, window) weights — where
the reference loops strip-by-strip on host
(`label_tracking/tracking_methods.py:50-58`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class HistoryAttention(nn.Module):
    char_vocab_size: int
    emb_size: int = 256
    query_dim: int = 32
    window_size: int = 1
    activation: str = "sigmoid"
    is_emb_train: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, char_indices: jax.Array) -> jax.Array:
        """char_indices: (..., window, max_char_len) int32 in
        [0, vocab_size]; vocab_size is the pad id (embedding row zeroed).

        Returns (..., window) float32 loss weights.
        """
        init = nn.initializers.normal(stddev=1.0)
        if self.is_emb_train:
            emb = self.param(
                "embedding", init,
                (self.char_vocab_size + 1, self.emb_size), self.param_dtype,
            )
        else:
            emb = self.variable(
                "constants", "embedding",
                lambda: _zero_pad_row(
                    init(self.make_rng("params") if self.has_rng("params")
                         else jax.random.PRNGKey(0),
                         (self.char_vocab_size + 1, self.emb_size),
                         self.param_dtype),
                    self.char_vocab_size),
            ).value

        pos_enc = self.param(
            "positional_encodings", nn.initializers.zeros,
            (self.window_size, self.emb_size), self.param_dtype,
        )

        word_embs = jnp.take(emb, char_indices, axis=0).mean(axis=-2)
        # (..., window, emb)
        word_embs = word_embs + pos_enc

        query = nn.Dense(self.query_dim, param_dtype=self.param_dtype, name="Wq")(
            word_embs
        )  # (..., window, Dq)
        scores = jnp.einsum("...wd,...vd->...wv", query, query) / jnp.sqrt(
            jnp.asarray(self.query_dim, jnp.float32)
        )
        attn = jax.nn.softmax(scores, axis=-1)  # (..., window, window)
        coef = nn.Dense(1, param_dtype=self.param_dtype, name="loss_coef_layer")(
            attn
        )[..., 0]  # (..., window)
        if self.activation == "sigmoid":
            weights = jax.nn.sigmoid(coef)
        elif self.activation == "softmax":
            weights = jax.nn.softmax(coef, axis=-1)
        elif self.activation == "relu":
            w = nn.relu(coef)
            weights = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)
        else:
            raise ValueError(f"unknown activation {self.activation!r}")
        return weights


def _zero_pad_row(emb: jax.Array, pad_row: int) -> jax.Array:
    return emb.at[pad_row, :].set(0.0)
