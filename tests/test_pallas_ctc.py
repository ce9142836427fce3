"""Pallas CTC kernel parity vs optax (loss and gradients).

Runs in interpreter mode on the CPU test platform; the same kernels compile
on TPU (exercised by bench/TPU runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qea_ocr_tpu.ops.pallas.ctc_pallas import ctc_loss_pallas


def make_case(seed, T=12, B=5, V=20, L=6):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(T, B, V)).astype(np.float32)
    # feasible alignments only ((T-1)//2 symbols always fit regardless of
    # repeats); infeasible rows have their own dedicated test — there the
    # impls agree only up to their -inf surrogates (1e5 clamp vs optax's
    # log_epsilon accumulation)
    max_len = max(1, min(L, (T - 1) // 2))
    lab_len = rng.integers(1, max_len + 1, B).astype(np.int32)
    labels = np.full((B, L), V, np.int32)
    for i in range(B):
        labels[i, :lab_len[i]] = rng.integers(1, V, lab_len[i])
    return jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(lab_len)


def optax_nll(logits, labels, lab_len, V):
    B, L = labels.shape
    T = logits.shape[0]
    lp = jnp.transpose(logits, (1, 0, 2))
    lpad = jnp.zeros((B, T))
    labpad = (jnp.arange(L)[None] >= lab_len[:, None]).astype(jnp.float32)
    safe = jnp.where(labels == V, 0, labels)
    return optax.ctc_loss(lp, lpad, safe, labpad, blank_id=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_loss_matches_optax(seed):
    T, B, V, L = 12, 5, 20, 6
    logits, labels, lab_len = make_case(seed, T, B, V, L)
    log_probs = jax.nn.log_softmax(logits, axis=2)
    ours = ctc_loss_pallas(log_probs, labels, lab_len, V, 0)
    want = optax_nll(log_probs, labels, lab_len, V)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want), rtol=2e-4)


def test_grad_matches_optax():
    T, B, V, L = 10, 4, 15, 5
    logits, labels, lab_len = make_case(3, T, B, V, L)

    def loss_ours(x):
        lp = jax.nn.log_softmax(x, axis=2)
        return jnp.sum(ctc_loss_pallas(lp, labels, lab_len, V, 0))

    def loss_optax(x):
        lp = jax.nn.log_softmax(x, axis=2)
        return jnp.sum(optax_nll(lp, labels, lab_len, V))

    g1 = jax.grad(loss_ours)(logits)
    g2 = jax.grad(loss_optax)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("seed,T,B,V,L", [
    (s, T, B, V, L)
    for s, (T, B, V, L) in enumerate([
        (31, 8, 95, 100),   # production geometry
        (12, 16, 20, 6),    # small vocab, bigger batch
        (7, 3, 10, 3),      # tiny T
        (64, 2, 50, 30),    # long sequence
        (31, 1, 95, 12),    # batch of one
    ])
])
def test_property_sweep_matches_optax(seed, T, B, V, L):
    """Soak: loss AND gradient parity with optax across shapes/seeds."""
    logits, labels, lab_len = make_case(seed, T, B, V, L)
    lp = jax.nn.log_softmax(logits, axis=2)
    ours = ctc_loss_pallas(lp, labels, lab_len, V, 0)
    want = optax_nll(lp, labels, lab_len, V)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                               rtol=3e-4, atol=1e-5)
    g1 = jax.grad(lambda x: jnp.sum(ctc_loss_pallas(
        jax.nn.log_softmax(x, axis=2), labels, lab_len, V, 0)))(logits)
    g2 = jax.grad(lambda x: jnp.sum(optax_nll(
        jax.nn.log_softmax(x, axis=2), labels, lab_len, V)))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=2e-4)


def test_degenerate_labels():
    """Empty (len 0), single-char, all-same-char (max CTC transitions), and
    max-len labels in one batch — the regimes a training run hits when the
    OCR returns garbage or the charmap collapses a label."""
    T, V, L = 31, 95, 100
    rng = np.random.default_rng(11)
    B = 4
    logits = jnp.asarray(rng.normal(size=(T, B, V)).astype(np.float32))
    labels = np.full((B, L), V, np.int32)
    # row 0: empty label; row 1: single char; row 2: same char repeated 15x
    # (needs blanks between repeats); row 3: length 15 random
    lab_len = np.asarray([0, 1, 15, 15], np.int32)
    labels[1, :1] = 7
    labels[2, :15] = 42
    labels[3, :15] = rng.integers(1, V, 15)
    lp = jax.nn.log_softmax(logits, axis=2)
    ours = ctc_loss_pallas(lp, jnp.asarray(labels), jnp.asarray(lab_len), V, 0)
    want = optax_nll(lp, jnp.asarray(labels), jnp.asarray(lab_len), V)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                               rtol=3e-4, atol=1e-5)


def test_infeasible_alignment_matches_optax():
    """2L+1 > T (label can't fit the timesteps, e.g. 16 same-char symbols in
    31 steps needs 31+ frames): both impls must agree (large/inf loss), and
    gradients must stay finite-or-equal rather than NaN-poisoning a step."""
    T, V, L = 10, 20, 8
    rng = np.random.default_rng(13)
    logits = jnp.asarray(rng.normal(size=(T, 2, V)).astype(np.float32))
    labels = np.full((2, L), V, np.int32)
    labels[0, :8] = 3          # 8 repeats of one char: needs 2*8-1+... > 10
    labels[1, :6] = rng.integers(1, V, 6)
    lab_len = jnp.asarray([8, 6], jnp.int32)
    lp = jax.nn.log_softmax(logits, axis=2)
    ours = np.asarray(ctc_loss_pallas(lp, jnp.asarray(labels), lab_len, V, 0))
    want = np.asarray(optax_nll(lp, jnp.asarray(labels), lab_len, V))
    # feasible row must match exactly
    np.testing.assert_allclose(ours[1], want[1], rtol=3e-4)
    # infeasible row: both agree it's effectively impossible (huge or inf),
    # and neither returns NaN
    assert not np.isnan(ours[0]) and not np.isnan(want[0])
    assert ours[0] > 1e4 or np.isinf(ours[0])
    assert want[0] > 1e4 or np.isinf(want[0])
    # gradients through the infeasible row must be finite (they come out of
    # the backward kernel as zeros), never NaN-poisoning the step
    g = jax.grad(lambda x: jnp.sum(ctc_loss_pallas(
        jax.nn.log_softmax(x, axis=2), jnp.asarray(labels), lab_len,
        V, 0)))(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_bf16_scores_cast_path():
    """The dispatch casts scores to f32 before the kernel; bf16 inputs must
    round-trip through the public ctc_loss_samplewise without blowing the
    tolerance vs the f32 reference."""
    from qea_ocr_tpu.ops.ctc import ctc_loss_samplewise
    T, B, V, L = 31, 4, 95, 12
    logits, labels, lab_len = make_case(5, T, B, V, L)
    lp = jax.nn.log_softmax(logits, axis=2)
    f32 = ctc_loss_samplewise(lp, labels, lab_len, pad_id=V)
    bf16 = ctc_loss_samplewise(lp.astype(jnp.bfloat16), labels, lab_len,
                               pad_id=V)
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32),
                               rtol=2e-2, atol=1e-2)


def test_dispatch_auto_prefers_pallas_on_tpu(monkeypatch):
    """QEA_CTC_IMPL=auto (the default) routes to the Pallas kernel exactly
    when the backend is TPU; =pallas forces it; =optax avoids it."""
    import qea_ocr_tpu.ops.ctc as ctc_mod
    monkeypatch.delenv("QEA_CTC_IMPL", raising=False)
    assert ctc_mod._use_pallas_ctc() == (jax.default_backend() == "tpu")
    monkeypatch.setenv("QEA_CTC_IMPL", "pallas")
    assert ctc_mod._use_pallas_ctc()
    monkeypatch.setenv("QEA_CTC_IMPL", "optax")
    assert not ctc_mod._use_pallas_ctc()


def test_long_labels_and_padding():
    # L=100 (production) -> S pads to 256; batch not a tile multiple.
    T, B, V, L = 31, 3, 95, 100
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(T, B, V)).astype(np.float32))
    lab_len = jnp.asarray([1, 9, 15], jnp.int32)
    labels = np.full((B, L), V, np.int32)
    for i, n in enumerate([1, 9, 15]):
        labels[i, :n] = rng.integers(1, V, n)
    lp = jax.nn.log_softmax(logits, axis=2)
    ours = ctc_loss_pallas(lp, jnp.asarray(labels), lab_len, V, 0)
    want = optax_nll(lp, jnp.asarray(labels), lab_len, V)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want), rtol=2e-4)
