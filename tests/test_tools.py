"""Offline tooling tests: CER-seed generation, CER analysis/split, pruning
CLI, sweep fallback."""

import json

import numpy as np



class TestCerSeed:
    def test_seed_patch_synthetic(self, tmp_path):
        from qea_ocr_tpu.tools.cer_seed import main
        out = tmp_path / "cers.json"
        main(["--mode", "patch", "--dataset", "synthetic", "--ocr", "Fake",
              "--synthetic_size", "3", "--max_strips", "4", "--out", str(out)])
        cers = json.loads(out.read_text())
        assert cers and all(0.0 <= v for v in cers.values())
        # reference key format {j}_{label}_{folder}_{file}
        key = next(iter(cers))
        assert len(key.split("_")) >= 3

    def test_seed_area_synthetic(self, tmp_path):
        from qea_ocr_tpu.tools.cer_seed import main
        out = tmp_path / "cers_area.json"
        main(["--mode", "area", "--dataset", "synthetic", "--ocr", "Fake",
              "--synthetic_size", "8", "--out", str(out)])
        cers = json.loads(out.read_text())
        assert len(cers) == 8


class TestCerAnalysis:
    def test_summary_and_split(self, tmp_path):
        from qea_ocr_tpu.tools.cer_analysis import (
            cer_summary, split_by_threshold)
        from qea_ocr_tpu.pruning.prune import doc_mean_cers
        strips = {f"{j}_L_f_d{i}": 0.1 * i for i in range(5) for j in range(2)}
        docs = doc_mean_cers(strips)
        s = cer_summary(docs)
        assert s["count"] == 5
        easy, hard = split_by_threshold(docs, 0.15)
        assert len(easy) == 2 and len(hard) == 3

    def test_copy_split(self, tmp_path):
        from qea_ocr_tpu.tools.cer_analysis import copy_split
        src = tmp_path / "src" / "f"
        src.mkdir(parents=True)
        for i in range(3):
            (src / f"d{i}.png").write_bytes(b"fake")
            (src / f"d{i}.json").write_text("[]")
        out = tmp_path / "out"
        copied = copy_split(str(tmp_path / "src"), str(out),
                            easy=["f_d0"], hard=["f_d1", "f_d2"])
        assert copied == dict(easy=1, hard=2)
        assert (out / "easy" / "d0.png").exists()
        assert (out / "hard" / "d2.json").exists()


class TestPruneCli:
    def test_artifact_roundtrip(self, tmp_path):
        from qea_ocr_tpu.tools.prune_cli import main
        cers = {f"0_X_f_d{i}": i / 10 for i in range(6)}
        src = tmp_path / "cers.json"
        src.write_text(json.dumps(cers))
        main(["--cers", str(src), "--method", "topk", "--num_samples", "2",
              "--out_dir", str(tmp_path), "--artifact_name", "art"])
        art = json.loads((tmp_path / "art.json").read_text())
        assert set(art) == {"f_d5", "f_d4"}


class TestSweepCLI:
    """Executed-code coverage of sweeps.sweep.main(): arg parsing, both
    --which branches (crnn builds base with crnn_model_path =
    exp_base_path + '/model'), --world_json overrides, --out artifact."""

    def test_main_crnn_branch(self, tmp_path, capsys):
        from qea_ocr_tpu.sweeps.sweep import main
        world = dict(
            synthetic_train_size=16, synthetic_val_size=8,
            lstm_hidden=32, batch_size=8,
            corruption=dict(noise_std=0.02, shading=0.0, salt_pepper=0.0))
        out = tmp_path / "result.json"
        main(["--which", "crnn", "--n_trials", "1", "--epoch", "1",
              "--exp_base_path", str(tmp_path / "exp"),
              "--world_json", json.dumps(world), "--out", str(out)])
        result = json.loads(out.read_text())
        assert {"lr", "std"} <= set(result["best_params"])
        assert result["best_value"] >= 0.0
        # the crnn branch writes checkpoints under exp_base_path/model*
        import glob as _glob
        assert _glob.glob(str(tmp_path / "exp" / "model*"))
        assert json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]) == result

    def test_main_patch_branch(self, tmp_path):
        from qea_ocr_tpu.sweeps.sweep import main
        world = dict(
            synthetic_train_docs=2, synthetic_val_docs=1,
            synthetic_strips_per_doc=2, max_strips=2, batch_docs=2,
            doc_size=(96, 128), lstm_hidden=16, unet_features=4,
            inner_limit=1, minibatch_subset="random",
            minibatch_subset_prop=0.5,
            corruption=dict(noise_std=0.05, shading=0.0, salt_pepper=0.0))
        out = tmp_path / "result.json"
        main(["--which", "patch", "--n_trials", "1", "--epoch", "1",
              "--exp_base_path", str(tmp_path / "exp"),
              "--world_json", json.dumps(world), "--out", str(out)])
        result = json.loads(out.read_text())
        assert {"lr_crnn", "lr_prep"} <= set(result["best_params"])


class TestSweepFallback:
    def test_random_search_crnn(self, tmp_path):
        from qea_ocr_tpu.sweeps import sweep
        result = sweep.run_sweep(
            "crnn", n_trials=1, storage=None, study_name="t",
            acc_floor=0.0, warmup_epochs=0,
            base_kwargs=dict(
                epochs=1, ocr="Fake", dataset="synthetic",
                synthetic_train_size=16, synthetic_val_size=8,
                lstm_hidden=32, batch_size=8,
                corruption=dict(noise_std=0.02, shading=0.0, salt_pepper=0.0),
                crnn_model_path=str(tmp_path / "m")))
        assert "best_params" in result and "lr" in result["best_params"]


class TestBuildPatchDataset:
    def test_mock_annotation_roundtrip(self, tmp_path):
        from PIL import Image
        src = tmp_path / "raw"
        src.mkdir()
        Image.fromarray(
            (np.ones((100, 150)) * 255).astype(np.uint8), "L").save(
            src / "doc0.png")
        from qea_ocr_tpu.tools.build_patch_dataset import build
        from qea_ocr_tpu.ocr.gvision import GVisionBackend
        dst = tmp_path / "out"
        n = build(str(src), str(dst), GVisionBackend(mock_response=True))
        assert n == 1
        sidecar = json.loads((dst / "doc0.json").read_text())
        assert sidecar and {"label", "x_min", "y_min", "x_max", "y_max"} <= set(
            sidecar[0])
        # loadable by PatchDocuments
        from qea_ocr_tpu.data.datasets import PatchDocuments
        ds = PatchDocuments(str(dst), max_strips=4)
        assert len(ds) == 1 and ds[0].strip_mask.sum() >= 1


class TestResolveSideShard:
    """resolve_side_shard (utils/io.py): pod resume picks this process's
    .pN side-state shard when one exists (patch_trainer._save_side_jsons
    writes tracked_labels_current.pN.json per host)."""

    def test_prefers_own_shard(self, tmp_path):
        from qea_ocr_tpu.utils.io import resolve_side_shard, save_json
        base = tmp_path / "tracked_labels_current.json"
        save_json({"who": "unsharded"}, str(base))
        save_json({"who": "p1"}, str(tmp_path / "tracked_labels_current.p1.json"))
        assert resolve_side_shard(str(base), 1).endswith(".p1.json")
        # process 0 has no shard -> falls back to the unsuffixed file
        assert resolve_side_shard(str(base), 0) == str(base)

    def test_missing_everything_returns_input(self, tmp_path):
        from qea_ocr_tpu.utils.io import resolve_side_shard
        p = str(tmp_path / "nope.json")
        assert resolve_side_shard(p, 3) == p
