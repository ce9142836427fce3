"""Atomic pair-cache semantics (qea_ocr_tpu/utils/pair_cache.py): the
2-process trainer pass may reuse its persistent compile cache ONLY when a
completion marker proves both workers' programs were fully written by the
current code — any other state wipes to symmetric-cold (the asymmetric
one-warm-one-cold cache is the Gloo rendezvous failure that made
MULTICHIP_r04 time out when round 4 worked around it with always-cold)."""

import os

from qea_ocr_tpu.utils import pair_cache

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prepare_wipes_unmarked_and_keeps_marked(tmp_path):
    d = tmp_path / "pc"
    out = pair_cache.prepare(_REPO, str(d))
    assert out == str(d) and os.path.isdir(d)

    # an unmarked (possibly partial, i.e. asymmetric) cache is wiped
    (d / "entry").write_text("x")
    pair_cache.prepare(_REPO, str(d))
    assert not (d / "entry").exists()

    # a completed pair run is preserved (symmetric-warm)
    (d / "entry").write_text("x")
    pair_cache.mark_complete(_REPO, str(d))
    pair_cache.prepare(_REPO, str(d))
    assert (d / "entry").exists()


def test_prepare_wipes_on_code_change(tmp_path, monkeypatch):
    d = tmp_path / "pc"
    pair_cache.prepare(_REPO, str(d))
    (d / "entry").write_text("x")
    pair_cache.mark_complete(_REPO, str(d))
    # a source change (different fingerprint) could invalidate one worker's
    # programs but not the other's -> must wipe, not run asymmetric
    monkeypatch.setattr(pair_cache, "_fingerprint", lambda repo: "changed")
    pair_cache.prepare(_REPO, str(d))
    assert not (d / "entry").exists()


def test_fingerprint_stable_and_content_sensitive(tmp_path):
    fp1 = pair_cache._fingerprint(_REPO)
    fp2 = pair_cache._fingerprint(_REPO)
    assert fp1 == fp2 and len(fp1) == 64
