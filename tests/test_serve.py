"""Serving path: DocumentCleaner + clean_docs CLI on the synthetic world."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qea_ocr_tpu.data.synth import make_document
from qea_ocr_tpu.models import UNet
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.io import save_checkpoint, save_image_png

DOC = (128, 128)  # small docs keep the UNet compile cheap on CPU


@pytest.fixture(scope="module")
def prep_ckpt(tmp_path_factory):
    model = UNet(init_features=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, *DOC)), train=False)
    state = ModelState.create(variables, adam_l2(1e-4))
    path = str(tmp_path_factory.mktemp("serve") / "prep")
    save_checkpoint(path, state)
    return path


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    rng = np.random.default_rng(0)
    for i in range(5):
        img, _ = make_document(rng, doc_h=DOC[0], doc_w=DOC[1], n_strips=3)
        save_image_png(img, str(d / f"doc_{i}.png"))
    return str(d)


def test_clean_arrays_geometry(prep_ckpt):
    from qea_ocr_tpu.serve import DocumentCleaner

    cleaner = DocumentCleaner(prep_ckpt, unet_features=4, doc_size=DOC,
                              batch_size=2)
    rng = np.random.default_rng(1)
    small = rng.random((60, 90), dtype=np.float32)
    exact = rng.random(DOC, dtype=np.float32)
    big = rng.random((DOC[0] * 2, DOC[1] * 2), dtype=np.float32)  # shrunk
    out = cleaner.clean_arrays([small, exact, big])  # 3 imgs, batch 2
    assert out[0].shape == (60, 90)
    assert out[1].shape == DOC
    # aspect-preserving shrink to fit the canvas
    assert out[2].shape == DOC
    for o in out:
        assert np.isfinite(o).all() and 0.0 <= o.min() and o.max() <= 1.0


def test_data_parallel_serving_matches_single_device(prep_ckpt):
    """--data_parallel shards the serving batch over the 8-virtual-device
    mesh; outputs must be bitwise-identical to the single-device path, and
    batch_size rounds UP to a device multiple (6 -> 8 on 8 devices)."""
    from qea_ocr_tpu.serve import DocumentCleaner

    rng = np.random.default_rng(2)
    imgs = [rng.random(DOC, dtype=np.float32) for _ in range(10)]
    single = DocumentCleaner(prep_ckpt, unet_features=4, doc_size=DOC,
                             batch_size=8)
    dp = DocumentCleaner(prep_ckpt, unet_features=4, doc_size=DOC,
                         batch_size=6, data_parallel=True)
    assert dp.mesh is not None
    assert dp.batch_size == 8  # rounded up to the device multiple
    out_s = single.clean_arrays(imgs)
    out_p = dp.clean_arrays(imgs)
    for a, b in zip(out_s, out_p):
        # partitioned convs schedule reductions differently per device, so
        # a float ULP wiggle can cross a round() boundary: allow exactly
        # one uint8 quantization step, require most pixels identical
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1.01 / 255.0)
        assert (a == b).mean() > 0.95


def test_clean_dir_duplicate_basenames(prep_ckpt, tmp_path):
    from qea_ocr_tpu.serve import DocumentCleaner

    rng = np.random.default_rng(5)
    for sub in ("a", "b"):
        os.makedirs(tmp_path / "docs" / sub)
        img, _ = make_document(rng, doc_h=DOC[0], doc_w=DOC[1], n_strips=2)
        save_image_png(img, str(tmp_path / "docs" / sub / "page.png"))
    cleaner = DocumentCleaner(prep_ckpt, unet_features=4, doc_size=DOC,
                              batch_size=4)
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    result = cleaner.clean_dir(str(tmp_path / "docs"),
                               str(tmp_path / "out"),
                               ocr=get_ocr_helper("Fake", is_eval=True))
    assert result["num_documents"] == 2
    assert sorted(os.listdir(tmp_path / "out")) == \
        ["a__page.png", "b__page.png"]
    # transcriptions keyed by relative path, returned without a JSON path
    assert sorted(result["transcriptions"]) == ["a/page.png", "b/page.png"]


def test_mxu_packed_env_parsing(monkeypatch):
    from qea_ocr_tpu.utils.platform import default_mxu_packed

    for off in ("0", "false", "FALSE", "no", "off", ""):
        monkeypatch.setenv("QEA_MXU_PACKED", off)
        assert default_mxu_packed() is False, off
    for on in ("1", "true", "yes"):
        monkeypatch.setenv("QEA_MXU_PACKED", on)
        assert default_mxu_packed() is True, on
    monkeypatch.delenv("QEA_MXU_PACKED")
    assert default_mxu_packed() is False  # training default: no hint -> vanilla


def test_mxu_packed_serving_batch_window(monkeypatch):
    from qea_ocr_tpu.utils.platform import (
        _mxu_packed_for_batch, default_mxu_packed)

    # measured window: win at 32, wash at 8, loss at 96 (serve_bench)
    assert _mxu_packed_for_batch(32, is_tpu=True)
    assert _mxu_packed_for_batch(16, is_tpu=True)
    assert _mxu_packed_for_batch(48, is_tpu=True)
    assert not _mxu_packed_for_batch(8, is_tpu=True)
    assert not _mxu_packed_for_batch(96, is_tpu=True)
    assert not _mxu_packed_for_batch(32, is_tpu=False)  # CPU: never
    # env forces either way, hint or not
    monkeypatch.setenv("QEA_MXU_PACKED", "1")
    assert default_mxu_packed(batch_hint=96) is True
    monkeypatch.setenv("QEA_MXU_PACKED", "0")
    assert default_mxu_packed(batch_hint=32) is False
    monkeypatch.delenv("QEA_MXU_PACKED")
    # on this (CPU) test platform the auto path resolves to vanilla
    assert default_mxu_packed(batch_hint=32) is False


def test_clean_docs_cli(prep_ckpt, doc_dir, tmp_path, capsys):
    from qea_ocr_tpu.cli.clean_docs import main

    out_dir = str(tmp_path / "cleaned")
    tpath = str(tmp_path / "transcripts.json")
    main(["--prep_path", prep_ckpt, "--input_dir", doc_dir,
          "--output_dir", out_dir, "--ocr", "Fake",
          "--transcripts", tpath, "--batch_size", "2",
          "--unet_features", "4", "--doc_size", str(DOC[0]), str(DOC[1])])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["num_documents"] == 5
    assert sorted(os.listdir(out_dir)) == [f"doc_{i}.png" for i in range(5)]
    transcripts = json.load(open(tpath))
    assert sorted(transcripts) == [f"doc_{i}.png" for i in range(5)]
    assert all(isinstance(v, list) for v in transcripts.values())
