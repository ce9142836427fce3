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
    lab_len = rng.integers(1, L + 1, B).astype(np.int32)
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
