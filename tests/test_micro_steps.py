"""Micro-stepped fused phase A+B (`micro_steps=G`).

The reference trains at bs=1 document — one CRNN and one prep Adam step
per document (`train_nn_patch.py:37,225-345`); the batched TPU step takes
one update per D-doc batch. `micro_steps=G` scans G sequential
(phase A -> phase B) chunk updates inside ONE jitted dispatch, so the
gold property is: micro-stepping a D-doc batch must reproduce a
batch_docs=D/G run over the same documents in the same order. These
tests pin that equivalence at the step level (exact same math as G
sequential phase_ab calls on the chunk sub-batches) and the trainer-level
contract (unchanged query ledger, G CRNN updates per batch).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qea_ocr_tpu import config as C
from qea_ocr_tpu.models import CRNN, UNet
from qea_ocr_tpu.tracking import decaying_weights
from qea_ocr_tpu.train.patch_steps import make_steps
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.charmap import CharMap

from test_patch_trainer import tiny_cfg


D, S, W, I = 4, 2, 2, 1
DOC = (64, 64)


def _world(seed=0):
    """Fresh states + batch every call: phase_ab donates its inputs."""
    cm = CharMap.default()
    L = cm.max_len
    prep = UNet(init_features=4, compute_dtype=jnp.float32)
    crnn = CRNN(vocab_size=cm.vocab_size, lstm_hidden=16,
                compute_dtype=jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    prep_state = ModelState.create(
        prep.init(k1, jnp.zeros((1, 1, *DOC)), train=False),
        adam_l2(1e-3, 5e-4))
    crnn_state = ModelState.create(
        crnn.init(k2, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False),
        adam_l2(1e-3, 5e-4))
    steps = make_steps(prep, crnn, cm)

    rng = np.random.default_rng(seed)
    N = D * S
    images = jnp.asarray(rng.random((D, 1, *DOC)).astype(np.float32))
    bboxes = np.zeros((D, S, 4), np.int32)
    bboxes[..., 0] = rng.integers(0, 20, (D, S))
    bboxes[..., 1] = rng.integers(0, 30, (D, S))
    bboxes[..., 2] = bboxes[..., 0] + rng.integers(10, 40, (D, S))
    bboxes[..., 3] = bboxes[..., 1] + rng.integers(8, 20, (D, S))
    bboxes = jnp.asarray(bboxes)
    _, strips = steps.prep_extract(prep_state, images, bboxes)
    gt_labels = np.full((D, S, L), cm.pad_id, np.int32)
    gt_labels[..., :3] = rng.integers(1, cm.vocab_size, (D, S, 3))
    hist_labels = jnp.asarray(np.broadcast_to(
        gt_labels.reshape(N, 1, L), (N, W, L)))
    batch = dict(
        images=images, bboxes=bboxes,
        strip_mask=jnp.ones((D, S), bool),
        gt_labels=jnp.asarray(gt_labels),
        gt_lengths=jnp.full((D, S), 3, jnp.int32),
        strip_ids=jnp.arange(N, dtype=jnp.int32).reshape(D, S),
        strips=strips,
        bb_mask=jnp.ones((N,), bool),
        hist_labels=hist_labels,
        hist_lengths=jnp.full((N, W), 3, jnp.int32),
        hist_valid=jnp.ones((N, W), bool),
        loss_weights=decaying_weights(0.7, W),
        jitter_images=strips[None].repeat(I, axis=0),
        jitter_labels=hist_labels[:, 0][None].repeat(I, axis=0),
        jitter_lengths=jnp.full((I, N), 3, jnp.int32),
    )
    tables = (jnp.ones((N,), jnp.float32), jnp.ones((N,), jnp.float32))
    return steps, prep_state, crnn_state, batch, tables


def _call_ab(steps, prep_state, crnn_state, b, cer, ent, micro_steps,
             micro_refresh=False):
    return steps.phase_ab(
        prep_state, crnn_state, b["images"], b["bboxes"], b["strip_mask"],
        b["gt_labels"], cer, ent, b["gt_lengths"], b["strip_ids"],
        b["strips"], b["bb_mask"], b["hist_labels"], b["hist_lengths"],
        b["hist_valid"], b["loss_weights"], b["jitter_images"],
        b["jitter_labels"], b["jitter_lengths"],
        decaying=True, inner_limit_skip=True, update_crnn=False,
        micro_steps=micro_steps, micro_refresh=micro_refresh)


def _doc_slice(b, lo, hi):
    """Chunk [lo, hi) of the batch — exactly what a batch_docs=hi-lo run
    would see for these documents."""
    out = {}
    for k, v in b.items():
        if k in ("strips", "bb_mask", "hist_labels", "hist_lengths",
                 "hist_valid"):
            out[k] = v[lo * S:hi * S]
        elif k in ("jitter_images", "jitter_labels", "jitter_lengths"):
            out[k] = v[:, lo * S:hi * S]
        elif k == "loss_weights":
            out[k] = v
        else:
            out[k] = v[lo:hi]
    return out


def test_micro_steps_equal_sequential_small_batches():
    G = 2
    steps, prep_state, crnn_state, batch, (cer, ent) = _world()
    (prep_m, crnn_m, doc_m, metrics_m, cer_m, ent_m,
     loss_a_m) = _call_ab(steps, prep_state, crnn_state, batch, cer, ent, G)

    # sequential reference: G phase_ab calls on the doc-major chunks
    steps, prep_state, crnn_state, batch, (cer, ent) = _world()
    Dc = D // G
    docs, losses_b, losses_a, cers = [], [], [], []
    for g in range(G):
        sl = _doc_slice(batch, g * Dc, (g + 1) * Dc)
        (prep_state, crnn_state, do, m, cer, ent, la) = _call_ab(
            steps, prep_state, crnn_state, sl, cer, ent, 1)
        docs.append(np.asarray(do))
        losses_b.append(float(m["loss"]))
        losses_a.append(float(la))
        cers.append(np.asarray(m["cers"]))

    leaf = lambda s: np.asarray(jax.tree_util.tree_leaves(s.params)[0])
    np.testing.assert_allclose(leaf(prep_m), leaf(prep_state),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cer_m), np.asarray(cer), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(doc_m), np.concatenate(docs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(metrics_m["cers"]), np.concatenate(cers),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(metrics_m["loss"]),
                               np.mean(losses_b), rtol=1e-5)
    np.testing.assert_allclose(float(loss_a_m),
                               np.mean(losses_a), rtol=1e-5)
    # G Adam steps happened, not one: step counter advanced by G
    assert int(prep_m.step) == G
    assert int(crnn_m.step) == G  # phase-A updates only (update_crnn=False)


def test_micro_refresh_equals_reextracting_sequential():
    """micro_refresh gold property: chunk g's phase A must see strips
    extracted with the prep AFTER g-1 phase-B updates — i.e. the
    micro-refresh program equals a manual loop that calls prep_extract
    with the current prep before each small-batch phase_ab."""
    G = 2
    steps, prep_state, crnn_state, batch, (cer, ent) = _world()
    (prep_m, crnn_m, doc_m, metrics_m, cer_m, ent_m, loss_a_m) = _call_ab(
        steps, prep_state, crnn_state, batch, cer, ent, G,
        micro_refresh=True)

    steps, prep_state, crnn_state, batch, (cer, ent) = _world()
    Dc = D // G
    losses_a = []
    for g in range(G):
        sl = _doc_slice(batch, g * Dc, (g + 1) * Dc)
        # re-extract with the CURRENT prep (the refresh semantics); the
        # jitter inputs keep the batch-start pixels (consistent with the
        # labels the host OCR produced from them)
        _, sl["strips"] = steps.prep_extract(
            prep_state, sl["images"], sl["bboxes"])
        (prep_state, crnn_state, do, m, cer, ent, la) = _call_ab(
            steps, prep_state, crnn_state, sl, cer, ent, 1)
        losses_a.append(float(la))

    leaf = lambda s: np.asarray(jax.tree_util.tree_leaves(s.params)[0])
    np.testing.assert_allclose(leaf(prep_m), leaf(prep_state),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(leaf(crnn_m), leaf(crnn_state),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cer_m), np.asarray(cer),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss_a_m), np.mean(losses_a),
                               rtol=1e-5)
    # and it actually differs from the stale-strips program after the
    # first chunk (the prep moved, so chunk 1's phase-A inputs changed)
    steps2, prep_state2, crnn_state2, batch2, (cer2, ent2) = _world()
    (_, crnn_stale, *_rest) = _call_ab(
        steps2, prep_state2, crnn_state2, batch2, cer2, ent2, G,
        micro_refresh=False)
    assert np.abs(leaf(crnn_m) - leaf(crnn_stale)).max() > 0


def test_phase_b_micro_matches_sequential():
    G = 2
    steps, prep_state, crnn_state, batch, (cer, ent) = _world()
    b = batch
    prep_m, _, _, metrics_m, cer_m, _ = steps.phase_b(
        prep_state, crnn_state, b["images"], b["bboxes"], b["strip_mask"],
        b["gt_labels"], cer, ent, b["gt_lengths"], b["strip_ids"],
        update_crnn=False, micro_steps=G)

    steps, prep_state, crnn_state, batch, (cer, ent) = _world()
    Dc = D // G
    for g in range(G):
        sl = _doc_slice(batch, g * Dc, (g + 1) * Dc)
        prep_state, crnn_state, _, m, cer, ent = steps.phase_b(
            prep_state, crnn_state, sl["images"], sl["bboxes"],
            sl["strip_mask"], sl["gt_labels"], cer, ent, sl["gt_lengths"],
            sl["strip_ids"], update_crnn=False, micro_steps=1)

    leaf = lambda s: np.asarray(jax.tree_util.tree_leaves(s.params)[0])
    np.testing.assert_allclose(leaf(prep_m), leaf(prep_state),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cer_m), np.asarray(cer),
                               rtol=1e-5, atol=1e-6)
    assert int(prep_m.step) == G


class TestTrainerMicroSteps:
    def test_ledger_unchanged_and_updates_scaled(self, tmp_path):
        from qea_ocr_tpu.train.patch_trainer import TrainNNPrep

        runs = {}
        for g in (1, 2):
            cfg = tiny_cfg(tmp_path / f"g{g}", epochs=1, batch_docs=4,
                           micro_steps=g, minibatch_subset="rangeCER",
                           minibatch_subset_prop=0.5)
            t = TrainNNPrep(cfg)
            t.train()
            import json
            with open(f"{tmp_path}/g{g}/metrics.jsonl") as f:
                rec = json.loads(f.readline())
            runs[g] = (t.ocr.total_calls, rec)
        # identical selection -> identical black-box query ledger
        assert runs[1][0] == runs[2][0]
        assert runs[1][1]["Black-Box Calls"] == runs[2][1]["Black-Box Calls"]
        # one batch of 4 docs: 1 fused dispatch = G CRNN updates
        assert runs[1][1]["CRNN Updates"] == 1
        assert runs[2][1]["CRNN Updates"] == 2
        assert np.isfinite(runs[2][1]["train_loss"])

    def test_micro_steps_must_divide_batch(self, tmp_path):
        from qea_ocr_tpu.train.patch_trainer import TrainNNPrep

        cfg = tiny_cfg(tmp_path, batch_docs=4, micro_steps=3)
        with pytest.raises(ValueError, match="micro_steps"):
            TrainNNPrep(cfg)
