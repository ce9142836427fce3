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


def test_facility_location_native_vs_numpy():
    """Both implementations run the same greedy; exact float64 gain TIES may
    resolve differently (summation order), so the contract is equal
    objective value, not identical index order."""
    def objective(x, idx):
        sim = (x.max() - x.min()) - np.abs(x[idx][:, None] - x[None, :])
        return float(sim.max(axis=0).sum())

    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(5, 200))
        k = int(rng.integers(1, min(n, 20) + 1))
        x = rng.random(n)
        got = native.facility_location_indices(x, k)
        lib, native._lib = native._lib, None
        tried, native._tried = native._tried, True
        ref = native.facility_location_indices(x, k)
        native._lib, native._tried = lib, tried
        assert len(set(got.tolist())) == k == len(set(ref.tolist()))
        og, orf = objective(x, got), objective(x, ref)
        assert og == pytest.approx(orf, rel=1e-3)


def test_facility_location_deterministic_and_tieless_case():
    # well-separated values, no gain ties: both paths must agree exactly
    x = np.asarray([0.0, 0.13, 0.55, 0.97, 0.41, 0.78])
    got1 = native.facility_location_indices(x, 3)
    got2 = native.facility_location_indices(x, 3)
    assert got1.tolist() == got2.tolist()
    lib, native._lib = native._lib, None
    tried, native._tried = native._tried, True
    ref = native.facility_location_indices(x, 3)
    native._lib, native._tried = lib, tried
    assert got1.tolist() == ref.tolist()
    # k >= n returns everything; k = 0 returns none
    assert sorted(native.facility_location_indices(x, 99).tolist()) == list(range(6))
    assert native.facility_location_indices(x, 0).size == 0
