"""Data-parallel CRNN warmup trainer: metric parity vs single-device.

The CRNN trainer's GSPMD DP mode (the reference's only multi-GPU artifact
is a dormant `nn.DataParallel`, `model_crnn.py:11-12`; SURVEY §5 calls for
DP as a first-class rebuild component) replicates model/opt state over a
1-D `data` mesh and shards the crop batch on the word axis. Same seed =>
same batch stream and same OCR query ledger; losses/accuracy agree to
layout-rounding tolerance.

Runs on the conftest 8-virtual-device CPU platform.
"""

import json
import os

import numpy as np
import pytest

from qea_ocr_tpu.train.crnn_trainer import CrnnTrainerConfig, TrainCRNN


def _cfg(tmp, **kw):
    base = dict(
        batch_size=8, epochs=2, lr=3e-4, ocr="Fake", dataset="synthetic",
        synthetic_train_size=16, synthetic_val_size=8,
        corruption=dict(noise_std=0.03, shading=0.05, salt_pepper=0.0),
        std=2, lstm_hidden=32,
        crnn_model_path=str(tmp / "model"), log_dir=str(tmp))
    base.update(kw)
    return CrnnTrainerConfig(**base)


def _run(tmp, **kw):
    trainer = TrainCRNN(_cfg(tmp, **kw))
    trainer.train()
    with open(os.path.join(str(tmp), "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    return trainer, recs


def test_dp_epoch_matches_single_device(tmp_path):
    (tmp_path / "ref").mkdir()
    (tmp_path / "dp").mkdir()
    t_ref, recs_ref = _run(tmp_path / "ref")
    t_dp, recs_dp = _run(tmp_path / "dp", data_parallel=True)
    assert t_ref.mesh is None and t_dp.mesh is not None
    assert len(t_dp.mesh.devices.flat) >= 2

    # identical black-box ledger: same batches, same noise, same val set
    assert t_dp.ocr.total_calls == t_ref.ocr.total_calls

    for r_ref, r_dp in zip(recs_ref, recs_dp):
        for k in ("train_loss", "val_loss"):
            assert np.isfinite(r_dp[k])
            assert r_dp[k] == pytest.approx(r_ref[k], rel=1e-2, abs=1e-3), k
        assert r_dp["CRNN_accuracy"] == pytest.approx(
            r_ref["CRNN_accuracy"], abs=0.26)  # 8-crop val: 2 flips allowed
        assert r_dp["Total Black-Box Calls"] == r_ref["Total Black-Box Calls"]


def test_dp_tail_batch_validation(tmp_path):
    # val size 10 with batch 8 -> one full + one padded window; every val
    # sample must be scored exactly once (OCR ledger counts real rows only)
    t, recs = _run(tmp_path, data_parallel=True, synthetic_val_size=10,
                   synthetic_train_size=8)
    # per epoch: 8 train queries + 10 val queries
    assert t.ocr.total_calls == 2 * (8 + 10)
    assert all(np.isfinite(r["val_loss"]) for r in recs)


def test_dp_rejects_indivisible_batch(tmp_path):
    import jax
    n_dev = len(jax.devices())
    with pytest.raises(ValueError, match="multiple of the device count"):
        TrainCRNN(_cfg(tmp_path, batch_size=n_dev + 1, data_parallel=True))
