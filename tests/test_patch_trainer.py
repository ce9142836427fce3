"""End-to-end patch trainer tests on the synthetic world: two-phase step,
budget formula accounting, label tracking, side-state JSONs, checkpoints.
Tiny shapes keep the CPU suite fast."""

import glob
import json
import os

import numpy as np
import pytest

from qea_ocr_tpu.train.patch_trainer import PatchTrainerConfig, TrainNNPrep


def tiny_cfg(tmp, **overrides):
    base = dict(
        epochs=2,
        ocr="Fake",
        dataset="synthetic",
        synthetic_train_docs=4,
        synthetic_val_docs=2,
        synthetic_strips_per_doc=3,
        max_strips=4,
        batch_docs=2,
        doc_size=(96, 128),
        corruption=dict(noise_std=0.08, shading=0.1, salt_pepper=0.0),
        inner_limit=2,
        inner_limit_skip=True,
        window_size=2,
        weightgen_method="decaying",
        lstm_hidden=32,
        unet_features=8,
        exp_base_path=str(tmp),
    )
    base.update(overrides)
    return PatchTrainerConfig(**base)


@pytest.fixture(scope="module")
def run_range_cer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("patch")
    cfg = tiny_cfg(tmp, minibatch_subset="rangeCER", minibatch_subset_prop=0.5)
    trainer = TrainNNPrep(cfg)
    best_acc, best_epoch = trainer.train()
    return trainer, best_acc, best_epoch, tmp


class TestPatchTrainer:
    def test_budget_formula(self, run_range_cer):
        trainer, *_ = run_range_cer
        # Per doc: ceil(3 * (1-0.5)) = 2 strips queried; 2 docs/batch,
        # 2 batches/epoch. inner_limit=2 with skip -> clean OCR (4) +
        # 1 jitter round (4) per batch = 8 per batch = 16/epoch train.
        # Val: 6 strips (2 docs x 3) per epoch.
        assert trainer.ocr.total_calls == 2 * (16 + 6)

    def test_tracked_labels_json(self, run_range_cer):
        trainer, _, _, tmp = run_range_cer
        path = os.path.join(str(tmp), "tracked_labels",
                            "tracked_labels_current.json")
        with open(path) as f:
            tracked = json.load(f)
        assert tracked  # some strips have history
        # reference-format names "{j}_{label}_{folder}_{file}"
        name = next(iter(tracked))
        assert name in trainer.dataset.name_to_id
        assert isinstance(tracked[name], list) and tracked[name]

    def test_selected_samples_bitmap(self, run_range_cer):
        trainer, _, _, tmp = run_range_cer
        with open(os.path.join(str(tmp), "selected_samples",
                               "selected_samples_current.json")) as f:
            sel = json.load(f)
        counts = np.asarray([np.sum(v) for v in sel.values()])
        assert counts.sum() > 0
        # per-epoch bitmaps sized epochs
        assert all(len(v) == 2 for v in sel.values())

    def test_cer_history_json(self, run_range_cer):
        trainer, _, _, tmp = run_range_cer
        with open(os.path.join(str(tmp), "cers", "all_cers.json")) as f:
            cers = json.load(f)
        # every valid strip gets a CER per epoch it appeared in
        assert all(len(v) == 2 for v in cers.values())
        assert all(0 <= c for v in cers.values() for c in v)

    def test_checkpoints_exist(self, run_range_cer):
        _, best_acc, _, tmp = run_range_cer
        names = {os.path.basename(p) for p in glob.glob(str(tmp / "ckpts" / "*"))}
        assert any(n.startswith("Prep_model_0_") for n in names)
        assert "CRNN_model_1" in names
        # best copy saved only on a strict improvement (reference
        # `train_nn_patch.py:456` semantics; acc 0.0 never triggers it)
        if best_acc > 0:
            assert "Prep_model_best" in names

    def test_metrics_logged(self, run_range_cer):
        trainer, _, _, tmp = run_range_cer
        with open(os.path.join(str(tmp), "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert len(recs) == 2
        for key in ["CRNN_accuracy", "Fake_accuracy", "CRNN_CER", "Fake_cer",
                    "train_loss", "val_loss", "Total Black-Box Calls",
                    "Black-Box Calls", "CRNN_OCR_Matching_ACC"]:
            assert key in recs[0], key

    def test_img_out(self, run_range_cer):
        _, _, _, tmp = run_range_cer
        assert os.path.exists(str(tmp / "img_out" / "out_0.png"))
        assert os.path.exists(str(tmp / "img_out" / "out_original.png"))


class TestPatchTrainerVariants:
    def test_no_selection_full_budget(self, tmp_path):
        cfg = tiny_cfg(tmp_path, minibatch_subset=None, epochs=1,
                       inner_limit=1, inner_limit_skip=True)
        trainer = TrainNNPrep(cfg)
        trainer.train()
        # all 3 strips per doc OCR'd once (no jitter: inner_limit=1 w/ skip)
        assert trainer.ocr.total_calls == (4 * 3) + 6

    def test_levenshtein_weightgen(self, tmp_path):
        cfg = tiny_cfg(tmp_path, minibatch_subset="topKCER",
                       weightgen_method="levenshtein", epochs=1)
        trainer = TrainNNPrep(cfg)
        best_acc, _ = trainer.train()
        assert 0.0 <= best_acc <= 1.0

    def test_attention_weightgen(self, tmp_path):
        cfg = tiny_cfg(tmp_path, minibatch_subset="random",
                       weightgen_method="self_attention",
                       emb_dim=16, query_dim=8, epochs=1)
        trainer = TrainNNPrep(cfg)
        best_acc, _ = trainer.train()
        assert 0.0 <= best_acc <= 1.0

    def test_uniform_entropy_selection(self, tmp_path):
        cfg = tiny_cfg(tmp_path, minibatch_subset="uniformEntropy",
                       minibatch_subset_prop=0.5, epochs=1)
        trainer = TrainNNPrep(cfg)
        best_acc, _ = trainer.train()
        assert 0.0 <= best_acc <= 1.0
        # entropy table was actually WRITTEN by phase B (it initializes
        # to all-ones, so a max()>0 check would be vacuous)
        import numpy as np
        tbl = np.asarray(trainer.ent_table)
        assert (tbl != 1.0).any()

    def test_global_selection(self, tmp_path):
        cfg = tiny_cfg(tmp_path, minibatch_subset="randomglobal",
                       minibatch_subset_prop=0.75, epochs=1)
        trainer = TrainNNPrep(cfg)
        trainer.train()
        assert trainer.global_bitmap.sum() == max(
            1, int(round(0.25 * trainer.dataset.num_strips)))

    def test_sync_ocr_same_budget(self, tmp_path):
        """async_ocr defaults ON (the suite's other trainers cover it);
        --no-async_ocr (reference-exact synchronous querying) must keep the
        identical budget ledger."""
        cfg = tiny_cfg(tmp_path, minibatch_subset="rangeCER",
                       minibatch_subset_prop=0.5, async_ocr=False)
        trainer = TrainNNPrep(cfg)
        best_acc, _ = trainer.train()
        # identical budget accounting to the async-pipelined run
        assert trainer.ocr.total_calls == 2 * (16 + 6)
        with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert len(recs) == 2
        assert np.isfinite(recs[-1]["train_loss"])

    def test_prep_ema_checkpoints_ema_params(self, tmp_path):
        """With prep_ema on, the EMA tracks-but-lags the raw prep params and
        is what the per-epoch checkpoint stores (same contract as the area
        trainer's --prep_ema)."""
        import jax
        from qea_ocr_tpu.utils.io import load_checkpoint

        cfg = tiny_cfg(tmp_path, minibatch_subset="rangeCER",
                       minibatch_subset_prop=0.5, prep_ema=0.9)
        trainer = TrainNNPrep(cfg)
        trainer.train()
        leaves_raw = jax.tree_util.tree_leaves(trainer.prep_state.params)
        leaves_ema = jax.tree_util.tree_leaves(trainer.ema_params)
        diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                 for a, b in zip(leaves_raw, leaves_ema)]
        assert max(diffs) > 0.0  # EMA lags the raw params
        ckpt = glob.glob(os.path.join(str(tmp_path), "ckpts",
                                      "Prep_model_1_*"))[0]
        loaded = load_checkpoint(ckpt, trainer.prep_state)
        for a, b in zip(jax.tree_util.tree_leaves(loaded.params), leaves_ema):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_cers_ocr_path_seeds_priors(self, tmp_path):
        """`--cers_ocr_path` warm start (reference `train_nn_patch.py:66-72`
        + shipped pos_dataset_cers.json): the device CER table initializes
        from the seed file's per-strip priors instead of cold-start 1.0,
        and every seeded strip pre-registers in the selected_samples
        bitmap. Seed generated by tools/cer_seed.seed_patch on the SAME
        synthetic world the trainer builds."""
        from qea_ocr_tpu.data.datasets import PatchDocuments
        from qea_ocr_tpu.ocr.base import get_ocr_helper
        from qea_ocr_tpu.ocr.engine import OcrQueryEngine
        from qea_ocr_tpu.tools.cer_seed import seed_patch
        from qea_ocr_tpu.utils.charmap import CharMap

        corruption = dict(noise_std=0.08, shading=0.1, salt_pepper=0.0)
        ds = PatchDocuments.synthetic(
            4, seed=42, n_strips=3, max_strips=4, corruption=corruption,
            doc_size=(96, 128))
        cm = CharMap.default()
        eng = OcrQueryEngine(get_ocr_helper("Fake"), cm)
        seed = seed_patch(ds, eng, cm)
        assert len(seed) == 12  # 4 docs x 3 strips, one offline call each
        assert eng.total_calls == 12
        path = tmp_path / "cers.json"
        path.write_text(json.dumps(seed))

        cfg = tiny_cfg(tmp_path, epochs=1, minibatch_subset="rangeCER",
                       minibatch_subset_prop=0.5, cers_ocr_path=str(path))
        trainer = TrainNNPrep(cfg)
        table = np.asarray(trainer.cer_table)
        for name, cer in seed.items():
            assert name in trainer.dataset.name_to_id, name
            i = trainer.dataset.name_to_id[name]
            assert abs(table[i] - cer) < 1e-6, (name, table[i], cer)
        # a warm prior is informative: the black box reads some raw strips
        assert (table < 1.0).any()
        assert set(seed) <= set(trainer.selected_samples)
        best_acc, _ = trainer.train()
        assert np.isfinite(best_acc)

    def test_prep_pretrain_reduces_recon_mse(self, tmp_path):
        import jax.numpy as jnp
        cfg = tiny_cfg(tmp_path, epochs=1, inner_limit=0,
                       prep_pretrain_epochs=4)
        trainer = TrainNNPrep(cfg)
        from qea_ocr_tpu.data.pipeline import collate_docs
        batch = collate_docs([trainer.dataset[0], trainer.dataset[1]])
        imgs = jnp.asarray(batch.images)
        before = float(jnp.mean(
            (trainer.prep_model.apply(trainer.prep_state.variables, imgs,
                                      train=False) - imgs) ** 2))
        trainer._prep_pretrain()
        after = float(jnp.mean(
            (trainer.prep_model.apply(trainer.prep_state.variables, imgs,
                                      train=False) - imgs) ** 2))
        assert after < before

    def test_resume_from_checkpoints(self, tmp_path):
        import glob
        cfg = tiny_cfg(tmp_path / "a", epochs=1, inner_limit=1,
                       inner_limit_skip=True, minibatch_subset="rangeCER")
        TrainNNPrep(cfg).train()
        prep_ck = glob.glob(str(tmp_path / "a" / "ckpts" / "Prep_model_0_*"))[0]
        crnn_ck = str(tmp_path / "a" / "ckpts" / "CRNN_model_0")
        cfg2 = tiny_cfg(tmp_path / "b", epochs=2, start_epoch=1,
                        prep_model=prep_ck, crnn_model=crnn_ck,
                        tracked_labels_path=str(
                            tmp_path / "a" / "tracked_labels" /
                            "tracked_labels_current.json"),
                        minibatch_subset="topKCER")
        trainer2 = TrainNNPrep(cfg2)
        # resumed lr equals the configured one, not the checkpointed one
        assert float(trainer2.crnn_state.opt_state.hyperparams[
            "learning_rate"]) == pytest.approx(cfg2.lr_crnn)
        best_acc, _ = trainer2.train()
        assert 0.0 <= best_acc <= 1.0

    def test_data_parallel_8dev(self, tmp_path):
        """Full trainer on the 8-virtual-device CPU mesh: batch of 8 docs
        sharded over the data axis, gradients psum'd by GSPMD."""
        cfg = tiny_cfg(tmp_path, minibatch_subset="rangeCER",
                       minibatch_subset_prop=0.5, epochs=1,
                       synthetic_train_docs=8, batch_docs=8,
                       data_parallel=True)
        trainer = TrainNNPrep(cfg)
        assert trainer.mesh is not None
        best_acc, _ = trainer.train()
        with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
            rec = json.loads(f.readline())
        assert np.isfinite(rec["train_loss"])

    @pytest.mark.parametrize("val_docs", [1, 3])
    def test_validation_tail_batches_scored(self, tmp_path, val_docs):
        """Every val doc is scored for any batch_docs/val-size combination:
        val_docs < batch_docs and val_docs % batch_docs != 0 both pad the
        tail with mask-zero docs instead of dropping it (reference iterates
        every val doc, train_nn_patch.py:366-398)."""
        strips = 3
        cfg = tiny_cfg(tmp_path, epochs=1, inner_limit=1,
                       inner_limit_skip=True, synthetic_val_docs=val_docs)
        trainer = TrainNNPrep(cfg)
        trainer.train()
        with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
            rec = json.loads(f.readline())
        # all val strips OCR'd exactly once
        assert rec["Train + Val BB Calls"] - rec["Black-Box Calls"] == \
            val_docs * strips
        assert np.isfinite(rec["val_loss"])
        # padded zero-docs must not leak into the masked MSE term
        assert rec["val_loss"] < 1e3

    def test_bb_call_ledger_parity(self, tmp_path):
        """Reference ledger semantics (train_nn_patch.py:350,398,410-413):
        Black-Box Calls is train-only; Total Black-Box Calls accumulates
        train-only; Total Train + Val BB Calls accumulates train+val;
        train_loss is normalized by train_set_size."""
        cfg = tiny_cfg(tmp_path, minibatch_subset="rangeCER",
                       minibatch_subset_prop=0.5)
        trainer = TrainNNPrep(cfg)
        trainer.train()
        with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        val_calls = 2 * 3  # 2 val docs x 3 strips per epoch
        train_calls = 16   # see test_budget_formula
        for i, rec in enumerate(recs):
            assert rec["Black-Box Calls"] == train_calls
            assert rec["Total Black-Box Calls"] == train_calls * (i + 1)
            assert rec["Train + Val BB Calls"] == train_calls + val_calls
            assert rec["Total Train + Val BB Calls"] == \
                (train_calls + val_calls) * (i + 1)
        # engine total includes validation queries
        assert trainer.ocr.total_calls == \
            recs[-1]["Total Train + Val BB Calls"]

    def test_tensor_parallel_matches_data_parallel(self, tmp_path):
        """--tensor_parallel 2 on the 8-virtual-device CPU mesh (4x2
        data x model): params/Adam moments really shard over `model`, and a
        full trainer epoch reproduces the pure-DP run's metrics (a
        PartitionSpec constrains layout, not math)."""
        import json as _json

        import jax

        common = dict(minibatch_subset="rangeCER", minibatch_subset_prop=0.5,
                      epochs=1, synthetic_train_docs=8, batch_docs=8)
        t_dp = TrainNNPrep(tiny_cfg(tmp_path / "dp", data_parallel=True,
                                    **common))
        t_dp.train()
        t_tp = TrainNNPrep(tiny_cfg(tmp_path / "tp", tensor_parallel=2,
                                    **common))
        assert t_tp.mesh is not None and t_tp.mesh.shape == {
            "data": 4, "model": 2}
        # at least one conv kernel physically sharded on the model axis
        from jax.sharding import PartitionSpec as P
        leaves = jax.tree_util.tree_leaves_with_path(t_tp.prep_state.params)
        sharded = [x for _, x in leaves
                   if getattr(x.sharding, "spec", P())[-1:] == ("model",)]
        assert sharded, "no parameter leaf sharded over the model axis"
        t_tp.train()
        rec_dp = _json.loads(open(str(tmp_path / "dp" / "metrics.jsonl")).readline())
        rec_tp = _json.loads(open(str(tmp_path / "tp" / "metrics.jsonl")).readline())
        # identical world/seeds/batching: only the parameter layout differs,
        # so the runs must agree up to cross-shard reduction order
        assert rec_tp["Black-Box Calls"] == rec_dp["Black-Box Calls"]
        assert rec_tp["Total Train + Val BB Calls"] == \
            rec_dp["Total Train + Val BB Calls"]
        assert np.isfinite(rec_tp["train_loss"])
        assert rec_tp["train_loss"] == pytest.approx(
            rec_dp["train_loss"], rel=1e-2)
        assert rec_tp["val_loss"] == pytest.approx(
            rec_dp["val_loss"], rel=1e-2)

    def test_zero_selection_batch_with_samplewise_weightgen(self, tmp_path):
        """A batch where the global bitmap selects NONE of its strips must
        still trace: under a per-sample weight generator (levenshtein) the
        loss_weights fallback has to keep the compiled (N, W+1) shape — a
        (W,) decaying fallback crashed the trace (and would diverge the
        compiled programs across hosts multi-process)."""
        cfg = tiny_cfg(
            tmp_path, epochs=1,
            # prop 0.95 -> global num = max(1, round(0.05 * 12)) = 1 strip
            # selected over 12: at 2 docs (8 slots) per batch, at least one
            # batch has zero selected strips.
            minibatch_subset="randomglobal", minibatch_subset_prop=0.95,
            weightgen_method="levenshtein")
        trainer = TrainNNPrep(cfg)
        trainer.train()   # must not raise
        # exactly 1 strip globally selected per round -> 2 train calls
        # (inner_limit=2) + val 6
        assert trainer.ocr.total_calls == 2 + 6

    def test_warmup_epochs_full_query(self, tmp_path):
        cfg = tiny_cfg(tmp_path, minibatch_subset="rangeCER",
                       warmup_epochs=1, epochs=1, inner_limit=1,
                       inner_limit_skip=True)
        trainer = TrainNNPrep(cfg)
        trainer.train()
        # warmup epoch: all valid strips queried
        assert trainer.ocr.epoch_calls == 4 * 3 + 6
