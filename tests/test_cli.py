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


class TestReferenceFormatDressRehearsal:
    """VERDICT item: a reference-format ON-DISK dataset tree — both sidecar
    schemas (exercised by `ref_world`'s per-doc alternation), a filtered
    >100-char label, a zero-surviving-strips document (dummy-strip path),
    and odd non-canvas geometry with padding offsets — driven through the
    full CLI path: `patch_cli` -> 1 train epoch -> `eval_prep`, with the
    budget ledger asserted per the reference formula."""

    def _build_tree(self, base):
        import numpy as np
        from PIL import Image

        from qea_ocr_tpu.tools.ref_world import write_patch_split
        from qea_ocr_tpu.data.synth import render_text_strip

        corr = dict(noise_std=0.1, shading=0.1, salt_pepper=0.0)
        # two generated docs (doc 0: min/max schema, doc 1: 4-corner)
        write_patch_split(str(base / "patch_dataset_train"), 2, seed=3,
                          n_strips=2, corruption=corr, doc_size=(96, 128))
        edge = base / "patch_dataset_train" / "edge"
        edge.mkdir()
        # zero-surviving-strips doc -> dummy ' ' strip (0,0,127,31)
        Image.fromarray(np.full((96, 128), 255, "uint8"), "L") \
            .save(edge / "allfiltered.png")
        (edge / "allfiltered.json").write_text(json.dumps([
            {"label": "Z" * 101, "x_min": 4, "y_min": 4,
             "x_max": 60, "y_max": 20},
        ]))
        # odd 60x100 doc, padded into (96,128) with offsets (18, 14)
        odd = np.ones((60, 100), np.float32)
        odd[5:25, 5:80] = render_text_strip("CASH", 20, 75)
        Image.fromarray((odd * 255).astype("uint8"), "L") \
            .save(edge / "odd.png")
        (edge / "odd.json").write_text(json.dumps([
            {"label": "CASH", "x_min": 5, "y_min": 5,
             "x_max": 80, "y_max": 25},
        ]))
        write_patch_split(str(base / "patch_dataset_dev"), 1, seed=4,
                          n_strips=2, corruption=corr, doc_size=(96, 128))
        write_patch_split(str(base / "patch_dataset_test"), 1, seed=5,
                          n_strips=2, corruption=corr, doc_size=(96, 128))

    def test_disk_tree_through_cli(self, tmp_path, capsys):
        from qea_ocr_tpu.cli.patch_cli import main as train_main
        from qea_ocr_tpu.data.datasets import PatchDocuments

        self._build_tree(tmp_path)
        # loader-level dress rehearsal: 4 docs, filters applied
        ds = PatchDocuments(str(tmp_path / "patch_dataset_train"),
                            doc_size=(96, 128), max_strips=4)
        by_name = {s.doc_name.split("/")[-1]: s for s in ds.samples}
        assert len(ds) == 4
        assert int(by_name["allfiltered"].strip_mask.sum()) == 1  # dummy
        assert tuple(by_name["allfiltered"].bboxes[0]) == (0, 0, 127, 31)
        assert tuple(by_name["odd"].bboxes[0]) == (
            5 + 14, 5 + 18, 80 + 14, 25 + 18)

        exp = tmp_path / "exp"
        train_main([
            "--ocr", "Fake", "--dataset", "patch",
            "--data_base_path", str(tmp_path),
            "--epoch", "1", "--max_strips", "4",
            "--batch_docs", "2", "--doc_size", "96", "128",
            "--minibatch_subset", "rangeCER",
            "--minibatch_subset_prop", "0.5",
            "--inner_limit", "2", "--inner_limit_skip",
            "--window_size", "2",
            "--lstm_hidden", "32", "--unet_features", "8",
            "--exp_base_path", str(exp),
        ])
        with open(exp / "metrics.jsonl") as f:
            rec = json.loads(f.readline())
        # per-doc k = ceil(n_valid/2): gen docs 2 strips -> 1 each, dummy
        # doc -> 1, odd doc -> 1; x2 inner rounds = 8; val = 1 doc x 2
        assert rec["Black-Box Calls"] == 2 * (1 + 1 + 1 + 1)
        assert rec["Train + Val BB Calls"] == 8 + 2
        ckpts = glob.glob(str(exp / "ckpts" / "Prep_model_0_*"))
        assert ckpts

        from qea_ocr_tpu.cli.eval_prep import main as eval_main
        eval_main([
            "--prep_path", ckpts[0],
            "--dataset", "patch_dataset", "--ocr", "Fake",
            "--data_base_path", str(tmp_path),
            "--unet_features", "8", "--doc_size", "96", "128",
            "--max_strips", "4", "--batch_docs", "1", "--show_orig",
        ])
        out = capsys.readouterr().out
        assert "Average CER from predicted images" in out
        assert "Average CER from original images" in out
