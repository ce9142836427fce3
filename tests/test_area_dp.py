"""Data-parallel area trainer: exact ledger parity vs single-device.

The area trainer's GSPMD DP mode (reference `train_nn_area.py` is strictly
single-device; SURVEY §5 calls for DP as a first-class rebuild component)
replicates model/opt state over a 1-D `data` mesh and shards the crop
batch on the word axis. Same seed => same selection stream => the OCR
budget ledger must match the single-device run EXACTLY; losses agree to
layout-rounding tolerance.

Runs on the conftest 8-virtual-device CPU platform.
"""

import json
import os

import numpy as np
import pytest

from qea_ocr_tpu.train.area_trainer import AreaTrainerConfig, TrainNNPrepArea


def _cfg(tmp, **kw):
    base = dict(
        batch_size=8, epochs=1, ocr="Fake", dataset="synthetic",
        synthetic_train_size=16, synthetic_val_size=8,
        corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0),
        minibatch_subset="rangeCER", minibatch_subset_prop=0.5,
        inner_limit=2, inner_limit_skip=True, window_size=2,
        lstm_hidden=32, unet_features=8, exp_base_path=str(tmp))
    base.update(kw)
    return AreaTrainerConfig(**base)


def _run(tmp, **kw):
    trainer = TrainNNPrepArea(_cfg(tmp, **kw))
    trainer.train()
    with open(os.path.join(str(tmp), "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    return trainer, rec


def test_dp_epoch_matches_single_device(tmp_path):
    t_ref, rec_ref = _run(tmp_path / "ref")
    t_dp, rec_dp = _run(tmp_path / "dp", data_parallel=True)
    assert t_ref.mesh is None and t_dp.mesh is not None
    assert len(t_dp.mesh.devices.flat) >= 2

    # exact ledger parity: same selection stream, same budget formula
    assert t_dp.ocr.total_calls == t_ref.ocr.total_calls
    for k in ("Black-Box Calls", "Total Black-Box Calls", "CRNN Updates"):
        assert rec_dp[k] == rec_ref[k], k

    # losses/metrics: same math, different device layout -> tight rel tol
    for k in ("train_loss", "val_loss", "CRNN_loss"):
        assert np.isfinite(rec_dp[k])
        assert rec_dp[k] == pytest.approx(rec_ref[k], rel=1e-2, abs=1e-3), k
    assert rec_dp["Fake_accuracy"] == pytest.approx(
        rec_ref["Fake_accuracy"], abs=0.26)  # 8-crop val: 2 flips allowed

    # the DP run must produce the standard artifacts
    assert os.path.exists(
        os.path.join(str(tmp_path / "dp"), "tracked_labels",
                     "tracked_labels_current.json"))


def test_dp_rejects_indivisible_batch(tmp_path):
    import jax
    n_dev = len(jax.devices())
    with pytest.raises(ValueError, match="multiple of the device count"):
        TrainNNPrepArea(_cfg(tmp_path, batch_size=n_dev + 1,
                             data_parallel=True))
