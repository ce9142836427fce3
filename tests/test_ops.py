"""Golden tests for core ops against independent pure-python references that
reproduce the upstream semantics (`utils.py:74-141`, `transform_helper.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qea_ocr_tpu.ops.ctc import ctc_loss_mean, ctc_loss_samplewise, greedy_decode
from qea_ocr_tpu.ops.edit_distance import (
    batched_levenshtein,
    cer_from_labels,
    compare_labels_device,
)
from qea_ocr_tpu.ops.text_stack import get_text_stack, get_text_stack_batch
from qea_ocr_tpu.ops.transforms import add_gaussian_noise
from qea_ocr_tpu.ops.entropy import mean_sequence_entropy
from qea_ocr_tpu.utils.charmap import CharMap


# ---------------------------------------------------------------- helpers
def py_levenshtein(a, b):
    """Classic O(len(a)*len(b)) DP, independent reference implementation."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


def py_greedy_decode(scores_tbv, blank=0):
    """Reference pred_to_string semantics (utils.py:74-92) on int ids."""
    ids = np.argmax(scores_tbv, axis=-1).T  # (B, T)
    out = []
    for row in ids:
        s = []
        for j, v in enumerate(row):
            if len(s) == 0 and v != blank:
                s.append(v)
            elif v != blank and row[j - 1] != v:
                s.append(v)
        out.append(s)
    return out


# ---------------------------------------------------------------- tests
class TestGreedyDecode:
    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(0)
        T, B, V = 31, 7, 96
        scores = rng.normal(size=(T, B, V)).astype(np.float32)
        dec, lens = greedy_decode(jnp.asarray(scores), pad_id=V)
        dec, lens = np.asarray(dec), np.asarray(lens)
        ref = py_greedy_decode(scores)
        for i in range(B):
            assert list(dec[i, : lens[i]]) == ref[i]
            assert np.all(dec[i, lens[i]:] == V)

    def test_collapse_repeats_and_blanks(self):
        # Sequence: blank, a, a, blank, a, b, b -> "a a b" -> [a, a, b]
        V = 4
        ids = [0, 1, 1, 0, 1, 2, 2]
        scores = np.full((len(ids), 1, V), -10.0, np.float32)
        for t, c in enumerate(ids):
            scores[t, 0, c] = 0.0
        dec, lens = greedy_decode(jnp.asarray(scores), pad_id=V)
        assert list(np.asarray(dec)[0, : int(lens[0])]) == [1, 1, 2]


class TestLevenshtein:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_pairs(self, seed):
        rng = np.random.default_rng(seed)
        B, L1, L2 = 16, 23, 19
        a_len = rng.integers(0, L1 + 1, B)
        b_len = rng.integers(0, L2 + 1, B)
        a = rng.integers(0, 5, (B, L1)).astype(np.int32)
        b = rng.integers(0, 5, (B, L2)).astype(np.int32)
        got = np.asarray(
            batched_levenshtein(
                jnp.asarray(a), jnp.asarray(a_len), jnp.asarray(b), jnp.asarray(b_len)
            )
        )
        for i in range(B):
            want = py_levenshtein(list(a[i, : a_len[i]]), list(b[i, : b_len[i]]))
            assert got[i] == want, (i, a[i, : a_len[i]], b[i, : b_len[i]])

    def test_strings_cer(self):
        cm = CharMap.default(max_len=16)
        preds = ["hello", "world", "", "same"]
        gts = ["hallo", "word", "x", "same"]
        p, pl = cm.encode(preds)
        g, gl = cm.encode(gts)
        cer = np.asarray(
            cer_from_labels(jnp.asarray(p), jnp.asarray(pl), jnp.asarray(g), jnp.asarray(gl))
        )
        want = [
            py_levenshtein(a, b) / max(1, len(b)) for a, b in zip(preds, gts)
        ]
        np.testing.assert_allclose(cer, want, rtol=1e-6)

    def test_compare_labels_counts(self):
        cm = CharMap.default(max_len=8)
        preds = ["abc", "abd", "x", ""]
        gts = ["abc", "abc", "x", ""]
        p, pl = cm.encode(preds)
        g, gl = cm.encode(gts)
        crt, cer_sum, _ = compare_labels_device(
            jnp.asarray(p), jnp.asarray(pl), jnp.asarray(g), jnp.asarray(gl)
        )
        assert int(crt) == 3
        want = sum(py_levenshtein(a, b) / max(1, len(b)) for a, b in zip(preds, gts))
        np.testing.assert_allclose(float(cer_sum), want, rtol=1e-6)


class TestTextStack:
    def test_center_pad_geometry(self):
        """Crop+pad must equal the reference padder math (utils.py:118-141)."""
        H, W = 64, 96
        doc = np.arange(H * W, dtype=np.float32).reshape(H, W) / (H * W)
        bbox = np.array([[10, 5, 40, 20]], dtype=np.int32)  # w=30, h=15
        out = np.asarray(get_text_stack(jnp.asarray(doc), jnp.asarray(bbox), 32, 128))
        assert out.shape == (1, 1, 32, 128)
        ch, cw = 15, 30
        pad_top = (32 - ch) // 2
        pad_left = (128 - cw) // 2
        crop = doc[5:20, 10:40]
        want = np.ones((32, 128), np.float32)
        want[pad_top:pad_top + ch, pad_left:pad_left + cw] = crop
        np.testing.assert_allclose(out[0, 0], want, rtol=1e-6)

    def test_batch_and_gradients_flow(self):
        D, S = 2, 3
        docs = jnp.ones((D, 1, 50, 60)) * 0.5
        bboxes = jnp.array(
            [[[0, 0, 10, 10], [5, 5, 30, 20], [0, 0, 1, 1]]] * D, dtype=jnp.int32
        )
        def loss(d):
            strips = get_text_stack_batch(d, bboxes, 32, 128)
            return jnp.sum(strips ** 2)
        g = jax.grad(loss)(docs)
        assert g.shape == docs.shape
        # Gradient must be nonzero inside bboxes and zero far outside.
        assert float(jnp.abs(g[0, 0, 6, 6])) > 0
        assert float(jnp.abs(g[0, 0, 45, 55])) == 0


class TestCTCLoss:
    def test_matches_torch_mean_semantics(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        T, B, V, L = 31, 5, 96, 12
        logits = rng.normal(size=(T, B, V)).astype(np.float32)
        log_probs = torch.log_softmax(torch.tensor(logits), dim=2)
        lab_len = rng.integers(1, L + 1, B)
        labels_flat = []
        labels_pad = np.full((B, L), V, np.int32)
        for i in range(B):
            row = rng.integers(1, V, lab_len[i])
            labels_pad[i, : lab_len[i]] = row
            labels_flat.extend(row.tolist())
        t_loss = torch.nn.CTCLoss(blank=0)(
            log_probs,
            torch.tensor(labels_flat, dtype=torch.int32),
            torch.tensor([T] * B, dtype=torch.int32),
            torch.tensor(lab_len, dtype=torch.int32),
        )
        j_scores = jax.nn.log_softmax(jnp.asarray(logits), axis=2)
        j_loss = ctc_loss_mean(
            j_scores, jnp.asarray(labels_pad), jnp.asarray(lab_len), pad_id=V
        )
        np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-3)

    def test_samplewise_matches_torch_none(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(4)
        T, B, V, L = 20, 4, 50, 8
        logits = rng.normal(size=(T, B, V)).astype(np.float32)
        log_probs = torch.log_softmax(torch.tensor(logits), dim=2)
        lab_len = rng.integers(1, L + 1, B)
        labels_pad = np.full((B, L), V, np.int32)
        flat = []
        for i in range(B):
            row = rng.integers(1, V, lab_len[i])
            labels_pad[i, : lab_len[i]] = row
            flat.extend(row.tolist())
        t_loss = torch.nn.CTCLoss(blank=0, reduction="none")(
            log_probs,
            torch.tensor(flat, dtype=torch.int32),
            torch.tensor([T] * B, dtype=torch.int32),
            torch.tensor(lab_len, dtype=torch.int32),
        )
        j_scores = jax.nn.log_softmax(jnp.asarray(logits), axis=2)
        j_loss = ctc_loss_samplewise(
            j_scores, jnp.asarray(labels_pad), jnp.asarray(lab_len), pad_id=V
        )
        np.testing.assert_allclose(np.asarray(j_loss), t_loss.numpy(), rtol=1e-3)


class TestTransforms:
    def test_noise_shape_and_clamp(self):
        key = jax.random.PRNGKey(0)
        imgs = jnp.ones((4, 1, 32, 128)) * 0.5
        noisy, noise = add_gaussian_noise(key, imgs, std=5, stochastic=True)
        assert noisy.shape == imgs.shape
        assert float(jnp.min(noisy)) >= 0.0 and float(jnp.max(noisy)) <= 1.0
        # subtractive: noisy == clip(img - noise)
        np.testing.assert_allclose(
            np.asarray(noisy), np.clip(np.asarray(imgs) - np.asarray(noise), 0, 1),
            rtol=1e-6,
        )

    def test_deterministic_std(self):
        key = jax.random.PRNGKey(1)
        imgs = jnp.full((2, 8, 8), 0.5)
        noisy, noise = add_gaussian_noise(key, imgs, std=5, stochastic=False)
        assert abs(float(jnp.std(noise)) - 0.05) < 0.02


class TestEntropy:
    def test_uniform_is_max_entropy(self):
        T, B, V = 10, 3, 95
        scores = jnp.log(jnp.full((T, B, V), 1.0 / V))
        ents = mean_sequence_entropy(scores, V)
        np.testing.assert_allclose(np.asarray(ents), np.ones(B), rtol=1e-4)

    def test_peaked_is_low_entropy(self):
        T, B, V = 10, 2, 95
        scores = np.full((T, B, V), -30.0, np.float32)
        scores[:, :, 3] = 0.0
        ents = mean_sequence_entropy(jax.nn.log_softmax(jnp.asarray(scores)), V)
        assert float(jnp.max(ents)) < 0.05


class TestCharMap:
    def test_roundtrip(self):
        cm = CharMap.default()
        words = ["Hello, World!", "a€b", "", " "]
        enc, lens = cm.encode(words)
        assert enc.shape == (4, 100)
        dec = cm.decode(enc, lens)
        assert dec == words

    def test_clean_caps_length(self):
        cm = CharMap.default(max_len=5)
        assert cm.clean("abcdef") == " "
        assert cm.clean("ab☃c") == "abc"  # snowman dropped
