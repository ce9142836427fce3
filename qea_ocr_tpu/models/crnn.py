"""CRNN proxy model (conv ladder -> BiLSTM -> log-softmax) in flax.linen.

Geometry parity with reference `models/model_crnn.py:5-56`: a 7-conv VGG-style
stack with pools (2,2)(2,2)(2,1)(2,1) and a final valid 2x2 conv maps a
(B, 1, 32, 128) strip to (B, 512, 1, 31); `map_to_sequence` yields 31 CTC
timesteps; a 2-layer bidirectional LSTM(512->256x2) and a Linear(512->vocab)
produce (T=31, B, V) log-probs.

TPU-first choices:
  * NHWC layout (XLA's native conv layout on TPU) instead of torch NCHW;
  * convs/matmuls run in bfloat16 (`compute_dtype`), params in float32;
  * the LSTM is an `nn.RNN`-scanned `nn.OptimizedLSTMCell` — 31 steps of
    (B, 512)x(512, 1024) matmuls that tile onto the MXU;
  * no NaN-scrubbing backward hook (reference `model_crnn.py:30-32`):
    the CTC loss here is computed in float32 with finite-loss masking at the
    trainer level instead.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvStack(nn.Module):
    """7-conv feature ladder, parity with reference `Convolutional`."""

    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    features: tuple = (64, 128, 256, 256, 512, 512, 512)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, 32, 128, 1) NHWC float. Returns (B, 1, 31, 512)."""
        f = self.features
        conv = lambda feat, k, pad: nn.Conv(
            feat, (k, k), padding=pad,
            dtype=self.compute_dtype, param_dtype=self.param_dtype,
        )
        pool = lambda y, wh: nn.max_pool(y, wh, strides=wh)

        x = x.astype(self.compute_dtype)
        x = pool(nn.relu(conv(f[0], 3, "SAME")(x)), (2, 2))      # (B,16,64,64)
        x = pool(nn.relu(conv(f[1], 3, "SAME")(x)), (2, 2))      # (B,8,32,128)
        x = nn.relu(conv(f[2], 3, "SAME")(x))                     # (B,8,32,256)
        x = pool(nn.relu(conv(f[3], 3, "SAME")(x)), (2, 1))      # (B,4,32,256)
        x = conv(f[4], 3, "SAME")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            dtype=self.compute_dtype, param_dtype=self.param_dtype,
        )(x)
        x = nn.relu(x)                                            # (B,4,32,512)
        x = conv(f[5], 3, "SAME")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            dtype=self.compute_dtype, param_dtype=self.param_dtype,
        )(x)
        x = nn.relu(x)
        x = pool(x, (2, 1))                                       # (B,2,32,512)
        x = nn.Conv(
            f[6], (2, 2), padding="VALID",
            dtype=self.compute_dtype, param_dtype=self.param_dtype,
        )(x)                                                      # (B,1,31,512)
        return x


class CRNN(nn.Module):
    """Conv ladder + 2-layer BiLSTM + linear CTC head.

    `__call__(x, train)` takes NCHW strips (B, 1, 32, 128) to match the
    framework-wide image layout and returns time-major log-probs (31, B, V).
    """

    vocab_size: int
    lstm_hidden: int = 256
    lstm_layers: int = 2
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    lstm_unroll: int = 1  # lax.scan unroll for the 31-step LSTMs
                          # (param-tree invariant; purely a compile knob)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # NCHW -> NHWC for TPU-native convs.
        x = jnp.transpose(x, (0, 2, 3, 1))
        feat = ConvStack(
            compute_dtype=self.compute_dtype, param_dtype=self.param_dtype
        )(x, train=train)                         # (B, 1, 31, C)
        B, H, W, C = feat.shape
        seq = feat.reshape(B, W, H * C)           # (B, T=31, 512)

        for layer in range(self.lstm_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(
                    self.lstm_hidden,
                    dtype=self.compute_dtype, param_dtype=self.param_dtype,
                ),
                unroll=self.lstm_unroll,
                name=f"lstm_fwd_{layer}",
            )(seq)
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(
                    self.lstm_hidden,
                    dtype=self.compute_dtype, param_dtype=self.param_dtype,
                ),
                reverse=True, keep_order=True, unroll=self.lstm_unroll,
                name=f"lstm_bwd_{layer}",
            )(seq)
            seq = jnp.concatenate([fwd, bwd], axis=-1)  # (B, T, 2*hidden)

        logits = nn.Dense(
            self.vocab_size, dtype=self.compute_dtype, param_dtype=self.param_dtype,
        )(seq)                                     # (B, T, V)
        logits = jnp.transpose(logits, (1, 0, 2)).astype(jnp.float32)  # (T, B, V)
        return jax.nn.log_softmax(logits, axis=2)
