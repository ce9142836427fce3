"""Pallas TPU kernels for the CTC loss alpha/beta recursions.

The CTC forward-backward is the framework's signature loss (invoked three
times per two-phase step, on folded batches up to B x window x strips). Its
emission gathers and gradient scatters are MXU/XLA-friendly and stay in XLA;
the strictly serial T-step recurrences run as Pallas kernels over
(B_tile, S) lane tiles in VMEM:

  alpha[t, s] = E[t, s] + LSE(alpha[t-1, s], alpha[t-1, s-1],
                              alpha[t-1, s-2] if skip[s])
  beta[t, s]  = LSE_{d in 0,1,2} (beta[t+1, s+d] + E[t+1, s+d]  [skip rules])
  dL/dE[t, s] = -exp(alpha[t, s] + beta[t, s] - logZ)

with S = 2L+1 extended labels (blank-interleaved), padded to a lane multiple.
Exposed as `ctc_loss_pallas` with a custom VJP; numerically validated against
`optax.ctc_loss` (tests/test_pallas_ctc.py). Interpreter mode makes it run
on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
B_TILE = 8


def _lse3(a, b, c):
    m = jnp.maximum(a, jnp.maximum(b, c))
    safe_m = jnp.where(m > NEG / 2, m, 0.0)
    out = safe_m + jnp.log(
        jnp.exp(a - safe_m) + jnp.exp(b - safe_m) + jnp.exp(c - safe_m))
    return jnp.where(m > NEG / 2, out, NEG)


def _forward_kernel(E_ref, skip_ref, elen_ref, nll_ref, alpha_ref):
    """Time-major layout for clean leading-axis tile access:
    E: (T, B_TILE, S); skip: (B_TILE, S); elen: (B_TILE, 1).
    Outputs: nll (B_TILE, 1), alpha (T, B_TILE, S)."""
    T = E_ref.shape[0]
    S = E_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (E_ref.shape[1], S), 1)
    skip = skip_ref[:] > 0

    a0 = jnp.where(col < 2, E_ref[0], NEG)
    alpha_ref[0] = a0

    def body(t, a):
        s1 = jnp.where(col >= 1, pltpu.roll(a, 1, axis=1), NEG)
        s2 = jnp.where((col >= 2) & skip, pltpu.roll(a, 2, axis=1), NEG)
        a_new = _lse3(a, s1, s2) + E_ref[t]
        alpha_ref[t] = a_new
        return a_new

    a = jax.lax.fori_loop(1, T, body, a0)

    elen = elen_ref[:]                      # (B_TILE, 1)
    last1 = jnp.max(jnp.where(col == elen - 1, a, NEG), axis=1, keepdims=True)
    last2 = jnp.max(jnp.where(col == elen - 2, a, NEG), axis=1, keepdims=True)
    m = jnp.maximum(last1, last2)
    safe_m = jnp.where(m > NEG / 2, m, 0.0)
    logz = safe_m + jnp.log(jnp.exp(last1 - safe_m) + jnp.exp(last2 - safe_m))
    nll_ref[:] = -jnp.where(m > NEG / 2, logz, NEG)


def _backward_kernel(E_ref, skip_ref, elen_ref, alpha_ref, nll_ref, grad_ref):
    """Computes dL/dE = -exp(alpha + beta - logZ) (before upstream scaling).
    Time-major: E/alpha/grad are (T, B_TILE, S)."""
    T = E_ref.shape[0]
    S = E_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (E_ref.shape[1], S), 1)
    skip = skip_ref[:] > 0
    elen = elen_ref[:]
    logz = -nll_ref[:]                       # (B_TILE, 1)

    bT = jnp.where((col == elen - 1) | (col == elen - 2), 0.0, NEG)
    grad_ref[T - 1] = -jnp.exp(alpha_ref[T - 1] + bT - logz)

    # Arrival-skip mask shifted to the departure slot: transition s -> s+2
    # is allowed iff skip[s+2].
    skip_dep = pltpu.roll(skip_ref[:], S - 2, axis=1) > 0

    def body(i, b_next):
        t = T - 2 - i
        c = b_next + E_ref[t + 1]
        b1 = jnp.where(col <= S - 2, pltpu.roll(c, S - 1, axis=1), NEG)
        b2 = jnp.where((col <= S - 3) & skip_dep, pltpu.roll(c, S - 2, axis=1), NEG)
        b = _lse3(c, b1, b2)
        b = jnp.where(col < elen, b, NEG)
        grad_ref[t] = -jnp.exp(alpha_ref[t] + b - logz)
        return b

    jax.lax.fori_loop(0, T - 1, body, bT)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _extend_labels(labels, label_lengths, blank_id, S):
    """Blank-interleaved extended labels (B, S) + skip mask + ext lengths."""
    B, L = labels.shape
    z = jnp.full((B, S), blank_id, labels.dtype)
    z = z.at[:, 1:2 * L + 1:2].set(labels)
    z_m2 = jnp.concatenate(
        [jnp.full((B, 2), blank_id, labels.dtype), z[:, :-2]], axis=1)
    col = jnp.arange(S)[None, :]
    skip = (z != blank_id) & (z != z_m2) & (col >= 2)
    elen = (2 * label_lengths + 1).astype(jnp.int32)
    return z, skip, elen


def _run_forward(E, skip, elen):
    T, B, S = E.shape
    interpret = jax.default_backend() != "tpu"
    grid = (B // B_TILE,)
    nll, alpha = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, B_TILE, S), lambda i: (0, i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((B_TILE, S), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((T, B_TILE, S), lambda i: (0, i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        ],
        interpret=interpret,
    )(E, skip, elen)
    return nll, alpha


def _run_backward(E, skip, elen, alpha, nll):
    T, B, S = E.shape
    interpret = jax.default_backend() != "tpu"
    grid = (B // B_TILE,)
    dE = pl.pallas_call(
        _backward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, B_TILE, S), lambda i: (0, i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((B_TILE, S), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((T, B_TILE, S), lambda i: (0, i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, B_TILE, S), lambda i: (0, i, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        interpret=interpret,
    )(E, skip, elen, alpha, nll)
    return dE


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ctc_loss_pallas(log_probs, labels, label_lengths, pad_id, blank_id=0):
    """Per-sample CTC NLL with Pallas alpha recursion.

    Args:
      log_probs: (T, B, V) normalized log-probabilities.
      labels: (B, L) int32 padded with pad_id.
      label_lengths: (B,) int32.
    Returns: (B,) float32 NLLs.
    """
    nll, _ = _ctc_fwd_impl(log_probs, labels, label_lengths, pad_id, blank_id)
    return nll


def _prep(log_probs, labels, label_lengths, pad_id, blank_id):
    T, B, V = log_probs.shape
    L = labels.shape[1]
    S = max(128, _pad_to(2 * L + 1, 128))
    safe_labels = jnp.where(labels == pad_id, blank_id, labels).astype(jnp.int32)
    z, skip, elen = _extend_labels(safe_labels, label_lengths, blank_id, S)
    # emissions via one-hot matmul (MXU-friendly, avoids TPU gathers):
    # E[t, b, s] = sum_v log_probs[t, b, v] * onehot(z)[b, s, v]
    onehot = jax.nn.one_hot(z, V, dtype=jnp.float32)              # (B, S, V)
    E = jnp.einsum("tbv,bsv->tbs", log_probs.astype(jnp.float32), onehot)
    # pad batch to a tile multiple
    B_pad = _pad_to(B, B_TILE)
    if B_pad != B:
        padE = jnp.zeros((T, B_pad - B, S), E.dtype)
        E = jnp.concatenate([E, padE], 1)
        skip = jnp.concatenate([skip, jnp.zeros((B_pad - B, S), bool)], 0)
        elen = jnp.concatenate([elen, jnp.ones((B_pad - B,), jnp.int32)], 0)
    return E, skip.astype(jnp.float32), elen[:, None], z, B


def _ctc_fwd_impl(log_probs, labels, label_lengths, pad_id, blank_id):
    E, skipf, elen2, z, B = _prep(log_probs, labels, label_lengths,
                                  pad_id, blank_id)
    nll, alpha = _run_forward(E, skipf, elen2)
    # Infeasible alignments (2*len+repeats-1 > T, e.g. an OCR garbage label
    # longer than the 31 CRNN timesteps allow) hit the kernel's -1e30
    # -inf surrogate; clamp the NLL to optax's log_epsilon magnitude (1e5)
    # so a single impossible row cannot blow up a mean-reduced batch loss
    # by 25 orders of magnitude. Gradients for such rows come out of the
    # backward kernel as zeros (beta is all -inf), which is safer for
    # training than optax's clamped-noise gradients.
    return jnp.minimum(nll[:B, 0], 1e5), (E, skipf, elen2, alpha, nll, z, B,
                                          log_probs.shape)


def _ctc_vjp_fwd(log_probs, labels, label_lengths, pad_id, blank_id):
    nll, res = _ctc_fwd_impl(log_probs, labels, label_lengths, pad_id, blank_id)
    return nll, res


def _ctc_vjp_bwd(pad_id, blank_id, res, g):
    E, skipf, elen2, alpha, nll, z, B, lp_shape = res
    T, _, V = lp_shape
    dE = _run_backward(E, skipf, elen2, alpha, nll)      # (T, B_pad, S)
    dE = dE[:, :B] * g[None, :, None]                     # upstream scale
    # scatter extended-label grads back to vocab: dY[t,b,v] = sum_{s:z=v} dE
    onehot = jax.nn.one_hot(z, V, dtype=dE.dtype)         # (B, S, V)
    dlp = jnp.einsum("tbs,bsv->tbv", dE, onehot)          # (T, B, V)
    return dlp, None, None


ctc_loss_pallas.defvjp(_ctc_vjp_fwd, _ctc_vjp_bwd)
