"""CLI surface smoke tests: argparse -> config wiring -> `main()` end-to-end
on the synthetic world. Flag names/defaults mirror the reference CLIs
(`patch_cli.py:10-156`, `area_cli.py:10-124`, `train_crnn.py:219-272`,
`eval_prep.py:185-201`); tiny shapes match the other suites so compiles come
from the persistent cache."""

import glob
import json
import os


class TestPatchCli:
    def test_train_then_eval_prep(self, tmp_path, capsys):
        from qea_ocr_tpu.cli.patch_cli import main as train_main

        train_main([
            "--ocr", "Fake", "--dataset", "synthetic",
            "--epoch", "1",
            "--synthetic_train_docs", "4", "--synthetic_val_docs", "2",
            "--synthetic_strips_per_doc", "3", "--max_strips", "4",
            "--batch_docs", "2", "--doc_size", "96", "128",
            "--minibatch_subset", "rangeCER",
            "--minibatch_subset_prop", "0.5",
            "--inner_limit", "2", "--inner_limit_skip",
            "--window_size", "2",
            "--lstm_hidden", "32", "--unet_features", "8",
            "--exp_base_path", str(tmp_path),
        ])
        # run manifest (reference patch_cli.py:173-176) + metrics stream
        assert os.path.exists(tmp_path / "params.txt")
        with open(tmp_path / "metrics.jsonl") as f:
            rec = json.loads(f.readline())
        # budget formula ceil(3*(1-0.5))=2 strips/doc * 4 docs, 2 inner
        # rounds (skip) = 16 train calls; val scores all 2*3 strips.
        assert rec["Black-Box Calls"] == 16
        assert rec["Train + Val BB Calls"] == 16 + 6
        # the per-epoch checkpoint always exists; Prep_model_best only
        # appears once val acc beats 0.0 (reference train_nn_patch.py:453
        # keeps the same strict-improvement quirk)
        ckpts = glob.glob(str(tmp_path / "ckpts" / "Prep_model_0_*"))
        assert ckpts

        from qea_ocr_tpu.cli.eval_prep import main as eval_main

        eval_main([
            "--prep_path", ckpts[0],
            "--dataset", "synthetic_patch", "--ocr", "Fake",
            "--unet_features", "8", "--doc_size", "96", "128",
            "--max_strips", "4", "--synthetic_strips_per_doc", "3",
            "--synthetic_docs", "2", "--batch_docs", "2",
        ])
        out = capsys.readouterr().out
        assert "Average CER from predicted images" in out


class TestCrnnCli:
    def test_train_then_eval_crnn(self, tmp_path, capsys):
        from qea_ocr_tpu.cli.train_crnn import main as train_main

        ckpt_prefix = tmp_path / "model"
        train_main([
            "--ocr", "Fake", "--dataset", "synthetic",
            "--epoch", "1", "--batch_size", "8",
            "--synthetic_train_size", "16", "--synthetic_val_size", "8",
            "--lstm_hidden", "32",
            "--crnn_model_path", str(ckpt_prefix),
        ])
        assert "Best val acc" in capsys.readouterr().out
        ckpts = glob.glob(str(ckpt_prefix) + "*")
        assert ckpts

        from qea_ocr_tpu.cli.eval_crnn import main as eval_main

        name = os.path.basename(ckpts[0])
        eval_main([
            "--crnn_path", str(tmp_path), "--crnn_model_name", name,
            "--dataset", "synthetic_area", "--ocr", "Fake",
            "--batch_size", "8", "--synthetic_size", "8",
            "--lstm_hidden", "32",
        ])
        out = capsys.readouterr().out
        assert "CER" in out


class TestAreaCli:
    def test_train_area(self, tmp_path):
        from qea_ocr_tpu.cli.area_cli import main as train_main

        train_main([
            "--ocr", "Fake", "--dataset", "synthetic",
            "--epoch", "1", "--batch_size", "8",
            "--synthetic_train_size", "16", "--synthetic_val_size", "8",
            "--minibatch_subset", "topKCER",
            "--minibatch_subset_prop", "0.5",
            "--inner_limit", "2", "--inner_limit_skip",
            "--window_size", "2", "--lr_scheduler", "cosine",
            "--lstm_hidden", "32", "--unet_features", "8",
            "--exp_base_path", str(tmp_path),
        ])
        assert os.path.exists(tmp_path / "params.txt")
        with open(tmp_path / "metrics.jsonl") as f:
            rec = json.loads(f.readline())
        # 2 batches x (ceil(8*0.5)=4 tracking + 4 jitter) = 16 train calls
        assert rec["Black-Box Calls"] == 16
        assert glob.glob(str(tmp_path / "ckpts" / "Prep_model_*"))
