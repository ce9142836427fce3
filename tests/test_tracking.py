"""Label-history tracking tests: ring-buffer semantics, weight generators
(Levenshtein generator has a hand-checkable closed form,
`tracking_methods.py:83-101`), and the weighted CTC loss reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qea_ocr_tpu.tracking import (
    LabelHistory,
    decaying_weights,
    levenshtein_weights,
    weighted_ctc_loss,
    weightgenerator_factory,
)
from qea_ocr_tpu.models import HistoryAttention
from qea_ocr_tpu.tracking.weights import attention_weights
from qea_ocr_tpu.ops.ctc import ctc_loss_samplewise
from qea_ocr_tpu.utils.charmap import CharMap


def py_lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


class TestLabelHistory:
    def test_ring_most_recent_first(self):
        cm = CharMap.default(max_len=8)
        h = LabelHistory(num_strips=4, window_size=3, charmap=cm)
        for text in ["one", "two", "three", "four"]:
            lab, ln = cm.encode([text])
            h.add(np.array([1]), lab, ln, [text])
        labs, lens, valid = h.gather(np.array([1, 0]))
        assert valid.tolist() == [[True, True, True], [False, False, False]]
        decoded = cm.decode(labs[0], lens[0])
        assert decoded == ["four", "three", "two"]  # newest at depth 0
        assert h.text_mirror[1] == ["one", "two", "three", "four"]

    def test_json_roundtrip(self, tmp_path):
        cm = CharMap.default(max_len=8)
        h = LabelHistory(3, 2, cm)
        lab, ln = cm.encode(["abc"])
        h.add(np.array([2]), lab, ln, ["abc"])
        p = str(tmp_path / "tracked.json")
        h.save_json(p, {0: "s0", 1: "s1", 2: "s2"})
        h2 = LabelHistory(3, 2, cm)
        h2.load_json(p, {"s0": 0, "s1": 1, "s2": 2})
        labs, lens, valid = h2.gather(np.array([2]))
        assert cm.decode(labs[0], lens[0])[0] == "abc"
        assert valid[0, 0] and not valid[0, 1]


class TestWeightGenerators:
    def test_decaying_closed_form(self):
        w = np.asarray(decaying_weights(0.7, 4))
        np.testing.assert_allclose(w, [1.0, 0.7, 0.49, 0.343], rtol=1e-6)

    def test_levenshtein_hand_checked(self):
        cm = CharMap.default(max_len=8)
        h = LabelHistory(2, 3, cm)
        # strip 0 history (oldest->newest): "ab", "ab", "ax"
        for t in ["ab", "ab", "ax"]:
            lab, ln = cm.encode([t])
            h.add(np.array([0]), lab, ln, [t])
        labs, lens, valid = h.gather(np.array([0]))
        w = np.asarray(levenshtein_weights(
            jnp.asarray(labs), jnp.asarray(lens), jnp.asarray(valid)))
        # depth0="ax": dists to "ab","ab" = 1,1 -> mean=1, len=2 ->
        #   0.5*(1-1/2)=0.25
        # depth1="ab": dists to "ax","ab" = 1,0 -> mean=0.5 ->
        #   0.5*(1-0.5/2)=0.375
        # depth2="ab": same as depth1 -> 0.375
        np.testing.assert_allclose(w[0], [1.0, 0.25, 0.375, 0.375], rtol=1e-5)

    def test_levenshtein_partial_history(self):
        cm = CharMap.default(max_len=8)
        h = LabelHistory(1, 3, cm)
        lab, ln = cm.encode(["zz"])
        h.add(np.array([0]), lab, ln, ["zz"])
        labs, lens, valid = h.gather(np.array([0]))
        w = np.asarray(levenshtein_weights(
            jnp.asarray(labs), jnp.asarray(lens), jnp.asarray(valid)))
        # single-element history: num_elements=max(0,1)=1, dist_sum=0 ->
        #   w = 0.5*(1-0) = 0.5; empty slots 0
        np.testing.assert_allclose(w[0], [1.0, 0.5, 0.0, 0.0], rtol=1e-5)

    def test_attention_weights_masked(self):
        V, W, L = 95, 3, 10
        model = HistoryAttention(char_vocab_size=V, emb_size=16, query_dim=8,
                                 window_size=W)
        x = jnp.full((2, W, L), V, jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x)
        valid = jnp.asarray([[True, True, False], [False, False, False]])
        w = np.asarray(attention_weights(model.apply, variables, x, valid))
        assert w.shape == (2, W + 1)
        np.testing.assert_allclose(w[:, 0], 1.0)
        assert w[0, 3] == 0.0 and np.all(w[1, 1:] == 0.0)

    def test_factory(self):
        for m in ["decaying", "levenshtein", "self_attention"]:
            assert weightgenerator_factory(m) == m
        with pytest.raises(KeyError):
            weightgenerator_factory("nope")


class TestWeightedCTC:
    def _setup(self):
        cm = CharMap.default(max_len=6)
        rng = np.random.default_rng(0)
        T, B, V, W = 12, 3, cm.vocab_size, 2
        scores = jax.nn.log_softmax(
            jnp.asarray(rng.normal(size=(T, B, V)).astype(np.float32)), axis=2)
        texts = [["ab", "cd"], ["ef", ""], ["gh", "ij"]]
        labs = np.full((B, W, 6), cm.pad_id, np.int32)
        lens = np.zeros((B, W), np.int32)
        valid = np.zeros((B, W), bool)
        for b in range(B):
            for w in range(W):
                t = texts[b][w]
                if t:
                    e, l = cm.encode([t])
                    labs[b, w], lens[b, w], valid[b, w] = e[0], l[0], True
        return cm, scores, jnp.asarray(labs), jnp.asarray(lens), jnp.asarray(valid)

    def test_decaying_reduction(self):
        cm, scores, labs, lens, valid = self._setup()
        w = decaying_weights(0.7, 2)
        loss = weighted_ctc_loss(scores, labs, lens, valid, w,
                                 pad_id=cm.pad_id, decaying=True)
        # hand-compute: per-depth mean over valid of nll/len, dot with weights
        per = np.zeros((3, 2))
        for d in range(2):
            nll = np.asarray(ctc_loss_samplewise(
                scores, labs[:, d], lens[:, d], pad_id=cm.pad_id))
            per[:, d] = nll / np.maximum(np.asarray(lens[:, d]), 1)
        v = np.asarray(valid)
        want = 0.0
        for d in range(2):
            m = v[:, d]
            want += float(np.asarray(w)[d]) * (per[m, d].mean())
        np.testing.assert_allclose(float(loss), want, rtol=1e-4)

    def test_samplewise_reduction_no_length_norm(self):
        cm, scores, labs, lens, valid = self._setup()
        B, W = 3, 2
        lw = jnp.asarray(np.random.default_rng(1).random((B, W + 1)).astype(np.float32))
        loss = weighted_ctc_loss(scores, labs, lens, valid, lw,
                                 pad_id=cm.pad_id, decaying=False)
        want = 0.0
        v = np.asarray(valid)
        for d in range(W):
            nll = np.asarray(ctc_loss_samplewise(
                scores, labs[:, d], lens[:, d], pad_id=cm.pad_id))
            m = v[:, d]
            # depth d consumes weight COLUMN d (reference
            # `tracking_utils.py:74`): depth 0 is the fresh label and
            # carries the generator's constant-1 column 0
            want += float((nll[m] * np.asarray(lw)[m, d]).mean())
        np.testing.assert_allclose(float(loss), want, rtol=1e-4)

    def test_empty_depth_contributes_zero(self):
        cm, scores, labs, lens, valid = self._setup()
        valid = valid.at[:, 1].set(False)
        w = decaying_weights(0.7, 2)
        loss_full = weighted_ctc_loss(scores, labs, lens, valid, w,
                                      pad_id=cm.pad_id, decaying=True)
        assert np.isfinite(float(loss_full))
