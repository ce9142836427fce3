"""Area trainer + evaluator end-to-end tests (synthetic world, tiny models),
plus the eval_utils programmatic API."""

import glob
import json
import os

import numpy as np
import pytest

from qea_ocr_tpu.train.area_trainer import AreaTrainerConfig, TrainNNPrepArea


@pytest.fixture(scope="module")
def area_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("area")
    cfg = AreaTrainerConfig(
        batch_size=8, epochs=2, ocr="Fake", dataset="synthetic",
        synthetic_train_size=16, synthetic_val_size=8,
        corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0),
        minibatch_subset="topKCER", minibatch_subset_prop=0.5,
        inner_limit=2, inner_limit_skip=True, window_size=2,
        lstm_hidden=32, unet_features=8, exp_base_path=str(tmp),
        lr_scheduler="cosine",
    )
    trainer = TrainNNPrepArea(cfg)
    best = trainer.train()
    return trainer, best, tmp


class TestAreaTrainer:
    def test_budget_accounting(self, area_run):
        trainer, _, _ = area_run
        # per batch: k = ceil(8*0.5) = 4; tracking OCR 4 + jitter 4 = 8;
        # 2 batches/epoch -> 16 train; val: 8 crops -> 1 batch of 8.
        assert trainer.ocr.total_calls == 2 * (16 + 8)

    def test_metrics_and_sides(self, area_run):
        _, _, tmp = area_run
        with open(os.path.join(str(tmp), "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert len(recs) == 2 and "Fake_accuracy" in recs[0]
        assert os.path.exists(
            os.path.join(str(tmp), "tracked_labels", "tracked_labels_current.json"))
        assert glob.glob(os.path.join(str(tmp), "ckpts", "Prep_model_*"))

    def test_cosine_lr_applied(self, area_run):
        trainer, _, _ = area_run
        lr = float(trainer.crnn_state.opt_state.hyperparams["learning_rate"])
        # epoch index 1 of 2: cos(pi/2)/... -> 0.5 * base
        assert lr == pytest.approx(0.5 * trainer.cfg.lr_crnn, rel=1e-3)

    def test_val_tail_scored_and_train_only_ledger(self, tmp_path):
        """Every val sample is scored for val_size % batch_size != 0 (the
        tail batch is padded+masked, not dropped), and the logged Black-Box
        counters stay train-only like the reference area ledger
        (train_nn_area.py:257-267,306-307)."""
        cfg = AreaTrainerConfig(
            batch_size=8, epochs=1, ocr="Fake", dataset="synthetic",
            synthetic_train_size=16, synthetic_val_size=10,
            corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0),
            minibatch_subset="topKCER", minibatch_subset_prop=0.5,
            inner_limit=1, inner_limit_skip=True, window_size=1,
            lstm_hidden=32, unet_features=8, exp_base_path=str(tmp_path))
        trainer = TrainNNPrepArea(cfg)
        trainer.train()
        # train: 2 batches x ceil(8*0.5)=4 tracking queries = 8;
        # val: all 10 crops queried (8 + padded tail of 2)
        assert trainer.ocr.total_calls == 8 + 10
        with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
            rec = json.loads(f.readline())
        assert rec["Black-Box Calls"] == 8
        assert rec["Total Black-Box Calls"] == 8
        assert np.isfinite(rec["val_loss"])
        # val_size < batch_size: a single padded batch still scores all
        cfg2 = AreaTrainerConfig(
            batch_size=8, epochs=1, ocr="Fake", dataset="synthetic",
            synthetic_train_size=8, synthetic_val_size=3,
            corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0),
            inner_limit=1, inner_limit_skip=True, window_size=1,
            lstm_hidden=32, unet_features=8,
            exp_base_path=str(tmp_path / "small"))
        trainer2 = TrainNNPrepArea(cfg2)
        trainer2.train()
        # no selection -> every train crop queried once (8) + 3 val
        assert trainer2.ocr.total_calls == 8 + 3

    def test_prep_ema_checkpoints_ema_params(self, tmp_path):
        """With prep_ema on, validation/checkpoints use the EMA params:
        they track but lag the raw training params, and the saved best
        checkpoint holds the EMA values, not the raw ones."""
        import jax
        from qea_ocr_tpu.utils.io import load_checkpoint

        cfg = AreaTrainerConfig(
            batch_size=8, epochs=1, ocr="Fake", dataset="synthetic",
            synthetic_train_size=16, synthetic_val_size=8,
            corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0),
            inner_limit=1, inner_limit_skip=True, window_size=1,
            lstm_hidden=32, unet_features=8, exp_base_path=str(tmp_path),
            prep_ema=0.9)
        trainer = TrainNNPrepArea(cfg)
        trainer.train()
        leaves_raw = jax.tree_util.tree_leaves(trainer.prep_state.params)
        leaves_ema = jax.tree_util.tree_leaves(trainer.ema_params)
        diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                 for a, b in zip(leaves_raw, leaves_ema)]
        assert max(diffs) > 0.0  # EMA lags the raw params
        # per-epoch checkpoint always written (best_* requires val acc > 0)
        ckpt = glob.glob(os.path.join(str(tmp_path), "ckpts",
                                      "Prep_model_0_*"))[0]
        loaded = load_checkpoint(ckpt, trainer.prep_state)
        for a, b in zip(jax.tree_util.tree_leaves(loaded.params), leaves_ema):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestEvalPrep:
    def test_eval_area_roundtrip(self, area_run, tmp_path):
        trainer, _, tmp = area_run
        from qea_ocr_tpu.eval.eval_utils import prep_eval
        ckpts = sorted(glob.glob(os.path.join(str(tmp), "ckpts", "Prep_model_1_*")))
        out = prep_eval(dict(
            prep_path=ckpts[0], dataset="synthetic_area", ocr="Fake",
            batch_size=8, synthetic_size=8, unet_features=8,
            corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0)))
        assert set(out) == {"test_accuracy", "test_cer"}
        assert 0.0 <= out["test_accuracy"] <= 1.0
        assert out["test_cer"] >= 0.0

    def test_eval_crnn(self, area_run, tmp_path):
        _, _, tmp = area_run
        from qea_ocr_tpu.eval.eval_crnn import EvalCRNN, EvalCrnnConfig
        cfg = EvalCrnnConfig(
            crnn_path=os.path.join(str(tmp), "ckpts"),
            crnn_model_name="CRNN_model_1", dataset="synthetic_area",
            ocr="Fake", batch_size=8, synthetic_size=8, lstm_hidden=32,
            show_orig=True,
            corruption=dict(noise_std=0.05, shading=0.05, salt_pepper=0.0))
        acc, cer = EvalCRNN(cfg).eval()
        assert 0.0 <= acc <= 1.0


class TestPruning:
    def test_topk(self):
        from qea_ocr_tpu.pruning.prune import doc_mean_cers, topk
        strip_cers = {
            "0_A_f_doc1": 0.9, "1_B_f_doc1": 0.7,
            "0_C_f_doc2": 0.1, "0_D_f_doc3": 0.5,
        }
        means = doc_mean_cers(strip_cers)
        assert means["f_doc1"] == pytest.approx(0.8)
        kept = topk(means, 2)
        assert set(kept) == {"f_doc1", "f_doc3"}

    def test_facility_location_diverse(self):
        from qea_ocr_tpu.pruning.prune import facility_location
        cers = {f"d{i}": v for i, v in enumerate(
            [0.0, 0.01, 0.02, 0.5, 0.51, 1.0])}
        kept = facility_location(cers, 3)
        vals = sorted(kept.values())
        # diverse: one from each cluster
        assert vals[0] < 0.1 and 0.4 < vals[1] < 0.6 and vals[2] > 0.9

    def test_pruning_indices(self, tmp_path):
        from qea_ocr_tpu.data.datasets import PatchDocuments
        from qea_ocr_tpu.pruning.prune import pruning_indices
        ds = PatchDocuments.synthetic(4, max_strips=4, n_strips=2,
                                      doc_size=(96, 128))
        # keep docs 1 and 3 by their folder_file key
        keys = [s.doc_name.replace(os.sep, "_") for s in ds.samples]
        art = tmp_path / "pruned.json"
        art.write_text(json.dumps({keys[1]: 0.5, keys[3]: 0.9}))
        idx = pruning_indices(ds, str(art))
        np.testing.assert_array_equal(idx, [1, 3])


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)

    def test_entry_compiles_tiny(self):
        # entry() uses production shapes; just validate it returns a
        # callable + args without running the full compile here (bench and
        # the driver compile-check cover execution).
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry2", os.path.join(os.path.dirname(__file__), "..",
                                         "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        assert callable(fn) and len(args) == 4
