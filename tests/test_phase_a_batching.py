"""Phase A's batched CRNN apply vs per-part applies.

Phase A may concatenate [history strips; jitter copies] into ONE CRNN
apply (frozen batch stats make that numerically identical) — but only
below `_phase_a_batch_rows()` total rows, because the batched apply holds
every part's conv activations live at once under grad and overflows v5e
HBM at the D=96 production batch (measured 20.24G vs 15.75G). These tests
pin the equivalence and the gate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from qea_ocr_tpu import config as C
from qea_ocr_tpu.models import CRNN
from qea_ocr_tpu.train.patch_steps import make_steps, _phase_a_batch_rows
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.tracking import decaying_weights
from qea_ocr_tpu.utils.charmap import CharMap


def _phase_a_world(N=6, W=2, I=2, seed=0):
    cm = CharMap.default()
    L = cm.max_len
    crnn = CRNN(vocab_size=cm.vocab_size, lstm_hidden=16,
                compute_dtype=jnp.float32)
    crnn_state = ModelState.create(
        crnn.init(jax.random.PRNGKey(seed),
                  jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False),
        adam_l2(1e-3, 5e-4))
    rng = np.random.default_rng(seed)
    strips = jnp.asarray(
        rng.random((N, 1, *C.INPUT_SIZE), dtype=np.float32))
    jitter = jnp.asarray(
        rng.random((I, N, 1, *C.INPUT_SIZE), dtype=np.float32))
    labels = np.full((N, W, L), cm.pad_id, np.int32)
    labels[..., :3] = rng.integers(1, cm.vocab_size, (N, W, 3))
    hist_labels = jnp.asarray(labels)
    hist_lengths = jnp.full((N, W), 3, jnp.int32)
    hist_valid = jnp.ones((N, W), bool)
    lw = decaying_weights(0.7, W)
    bb_mask = jnp.ones((N,), bool)
    jl = hist_labels[:, 0][None].repeat(I, axis=0)
    jlen = hist_lengths[:, 0][None].repeat(I, axis=0)
    # UNet/prep unused here; reuse the CRNN as a stand-in prep model —
    # make_steps never applies it unless prep_extract/phase_b run.
    steps = make_steps(crnn, crnn, cm)
    return steps, crnn_state, dict(
        strips=strips, bb_mask=bb_mask, hist_labels=hist_labels,
        hist_lengths=hist_lengths, hist_valid=hist_valid, lw=lw,
        jitter=jitter, jl=jl, jlen=jlen)


def _run(steps, crnn_state, w):
    new_state, loss = steps.phase_a(
        crnn_state, w["strips"], w["bb_mask"], w["hist_labels"],
        w["hist_lengths"], w["hist_valid"], w["lw"],
        w["jitter"], w["jl"], w["jlen"],
        decaying=True, inner_limit_skip=True)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    return float(loss), np.asarray(leaf, np.float64)


def test_batched_and_per_part_phase_a_match(monkeypatch):
    monkeypatch.setenv("QEA_PHASE_A_BATCH_ROWS", "1000000")
    steps, state, w = _phase_a_world()
    loss_b, leaf_b = _run(steps, state, w)

    monkeypatch.setenv("QEA_PHASE_A_BATCH_ROWS", "0")
    steps, state, w = _phase_a_world()   # fresh (phase_a donates state)
    loss_u, leaf_u = _run(steps, state, w)

    np.testing.assert_allclose(loss_b, loss_u, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(leaf_b, leaf_u, rtol=1e-4, atol=1e-6)


def test_batch_rows_gate_defaults_below_production_batch(monkeypatch):
    monkeypatch.delenv("QEA_PHASE_A_BATCH_ROWS", raising=False)
    limit = _phase_a_batch_rows()
    # the D=96 x 16-slot x (1 history + 2 jitter) production batch must
    # NOT take the batched path (it OOMs a 16G v5e)...
    assert 3 * 96 * 16 > limit
    # ...while the measured quality-run batches must keep it
    assert 3 * 8 * 16 <= limit
    monkeypatch.setenv("QEA_PHASE_A_BATCH_ROWS", "7")
    assert _phase_a_batch_rows() == 7
