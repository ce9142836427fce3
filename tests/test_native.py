"""Native host-ops library tests (ctypes binding + numpy fallback parity)."""

import numpy as np
import pytest

from qea_ocr_tpu.utils import native


def test_batch_levenshtein_matches_python():
    rng = np.random.default_rng(0)
    B, L1, L2 = 32, 20, 17
    a = rng.integers(0, 5, (B, L1))
    al = rng.integers(0, L1 + 1, B)
    b = rng.integers(0, 5, (B, L2))
    bl = rng.integers(0, L2 + 1, B)
    got = native.batch_levenshtein(a, al, b, bl)
    want = [native._py_lev(a[i, :al[i]], b[i, :bl[i]]) for i in range(B)]
    assert got.tolist() == want


def test_pairwise_symmetry_and_diag():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 4, (6, 4, 12))
    lengths = rng.integers(0, 13, (6, 4))
    pw = native.pairwise_levenshtein(labels, lengths)
    assert (pw == pw.transpose(0, 2, 1)).all()
    assert (np.diagonal(pw, axis1=1, axis2=2) == 0).all()


def test_ctc_collapse_semantics():
    ids = np.array([[0, 3, 3, 0, 3, 1, 1, 0]])
    out, ln = native.ctc_collapse(ids, blank=0, pad=9)
    assert out[0, :ln[0]].tolist() == [3, 3, 1]
    assert (out[0, ln[0]:] == 9).all()


def test_compare_labels_and_string_cer():
    crt, cer = native.string_cer(["ab", "cd", ""], ["ab", "ce", "x"])
    assert crt == 1
    assert cer == pytest.approx(0.5 + 1.0)


def test_fallback_matches_native():
    if not native.have_native():
        pytest.skip("no native lib")
    rng = np.random.default_rng(2)
    a = rng.integers(0, 5, (8, 10))
    al = rng.integers(0, 11, 8)
    b = rng.integers(0, 5, (8, 10))
    bl = rng.integers(0, 11, 8)
    fast = native.batch_levenshtein(a, al, b, bl)
    slow = [native._py_lev(a[i, :al[i]], b[i, :bl[i]]) for i in range(8)]
    assert fast.tolist() == slow
