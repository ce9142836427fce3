"""Run the REFERENCE CODE ITSELF as the quality-parity oracle.

`benchmarks/torch_reference_quality.py` reruns the reference *algorithm*
(an independent reimplementation written from the SURVEY spec). This
harness removes the remaining inferential step: it drives the actual
artifacts at `/root/reference` — `train_crnn.TrainCRNN` (warmup),
`train_nn_patch.TrainNNPrep` (`train_nn_patch.py:193-467`), and
`eval_prep.EvalPrep` (`eval_prep.py:110-175`) — VERBATIM, on the same
synthetic world + FakeOCR black box the rebuild's quality runs use:

  1. the world is written to disk in the reference's own formats
     (`qea_ocr_tpu/tools/ref_world.py`: doc PNGs + bbox sidecars in both
     schemas; `{idx}_{LABEL}_synth.png` word crops);
  2. missing third-party deps are shimmed (`tools/ref_shims.py`); the
     black box is the reference's own `TessHelper` code running against
     the stub `tesserocr` whose recognition is the SAME deterministic
     `FakeOcrBackend` template matcher the rebuild queries — identical
     OCR behavior on both sides of the head-to-head;
  3. seed CERs come from the rebuild's `tools/cer_seed.seed_patch` — the
     harness asserts its strip names match the reference dataset's names
     EXACTLY (`{j}_{label}_synth_doc_%05d`), proving the cer-seed tool's
     output is directly consumable by the reference (`--cers_ocr_path`,
     `train_nn_patch.py:66-72`);
  4. per-epoch ledgers are read from the reference's own `wandb.log`
     records (captured by the stub) and asserted against the budget
     formula `inner_limit * ceil(S * (1 - prop))` per document.

Scale via env (defaults sized for ~30-60 min on a 1-core CPU box):
  BUDGET_PROP=0.75 TRAIN_DOCS=24 PATCH_EPOCHS=6 \
      python benchmarks/reference_verbatim.py

Compare against `benchmarks/torch_reference_quality.py` and
`scripts/quality_run.py` at the same knobs (see benchmarks/RESULTS.md
"Verbatim-reference oracle").
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# keep jax (used only for seed-CER strip extraction) off the real TPU
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# --- world config (keep in lockstep with scripts/quality_run.py) ----------
CORRUPTION = dict(noise_std=0.18, shading=0.25, salt_pepper=0.01)
WARMUP_CORRUPTION = json.loads(os.environ.get(
    "WARMUP_CORRUPTION",
    '{"noise_std": 0.14, "shading": 0.18, "salt_pepper": 0.007}'))
BUDGET_PROP = float(os.environ.get("BUDGET_PROP", 0.75))
STRIPS_PER_DOC = int(os.environ.get("STRIPS_PER_DOC", 8))
TRAIN_DOCS = int(os.environ.get("TRAIN_DOCS", 24))
VAL_DOCS = int(os.environ.get("VAL_DOCS", 8))
EVAL_DOCS = int(os.environ.get("EVAL_DOCS", 16))
PATCH_EPOCHS = int(os.environ.get("PATCH_EPOCHS", 6))
WARM_SIZE = int(os.environ.get("WARM_SIZE", 512))
WARM_EPOCHS = int(os.environ.get("WARM_EPOCHS", 10))
WINDOW_SIZE = int(os.environ.get("WINDOW_SIZE", 3))
INNER_LIMIT = 2
OUT = os.environ.get("QUALITY_OUT", "/tmp/ref_verbatim")
SEED = 42
DOC_SIZE = (400, 512)   # the reference PatchDataset hardcodes this canvas
                        # (`datasets/patch_dataset.py:21`)


def build_world():
    """World on disk (reference formats) + seed CERs + name differential."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from qea_ocr_tpu.data.datasets import PatchDocuments
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    from qea_ocr_tpu.ocr.engine import OcrQueryEngine
    from qea_ocr_tpu.tools.cer_seed import seed_patch
    from qea_ocr_tpu.tools.ref_world import (
        PATCH_TEST, write_patch_split, write_patch_world, write_word_world)
    from qea_ocr_tpu.utils.charmap import CharMap

    world = os.path.join(OUT, "world")
    write_patch_world(world, TRAIN_DOCS, VAL_DOCS, seed=SEED,
                      n_strips=STRIPS_PER_DOC, corruption=CORRUPTION,
                      doc_size=DOC_SIZE)
    write_patch_split(os.path.join(world, PATCH_TEST), EVAL_DOCS, seed=1234,
                      n_strips=STRIPS_PER_DOC, corruption=CORRUPTION,
                      doc_size=DOC_SIZE)
    write_word_world(world, WARM_SIZE, 256, seed=SEED,
                     corruption=WARMUP_CORRUPTION)

    # seed CERs from the rebuild's tool, on the rebuild's in-memory twin of
    # the same world — the name sets must match the on-disk tree exactly.
    cm = CharMap.default()
    ds = PatchDocuments.synthetic(
        TRAIN_DOCS, seed=SEED, n_strips=STRIPS_PER_DOC,
        max_strips=STRIPS_PER_DOC, corruption=CORRUPTION, doc_size=DOC_SIZE)
    eng = OcrQueryEngine(get_ocr_helper("Fake"), cm)
    cers = seed_patch(ds, eng, cm)
    cers_path = os.path.join(OUT, "cers_seed.json")
    with open(cers_path, "w") as f:
        json.dump(cers, f)
    print(f"[world] {TRAIN_DOCS}+{VAL_DOCS}+{EVAL_DOCS} docs, "
          f"{len(cers)} seed CERs ({eng.total_calls} offline bb calls) "
          f"-> {world}", flush=True)
    return world, cers_path, set(cers)


def reference_names(ref_train_ds) -> set:
    """Strip names exactly as the reference trainer builds them
    (`train_nn_patch.py:245-249`)."""
    names = set()
    for _img, labels_dict, name in ref_train_ds:
        folder, file_name = name.split("/")[-2:]
        file_name = file_name.split(".")[0]
        for j, lbl in enumerate(labels_dict):
            names.add(f"{j}_{lbl['label']}_{folder}_{file_name}")
    return names


def run_warmup(world: str) -> str:
    """Verbatim `train_crnn.TrainCRNN` on the on-disk word-crop world with
    OCR labels (OCRDataset path, `datasets/ocr_dataset.py:40`)."""
    import glob

    from train_crnn import TrainCRNN

    ckpt_dir = os.path.join(OUT, "crnn")
    os.makedirs(ckpt_dir, exist_ok=True)
    args = argparse.Namespace(
        batch_size=64, random_seed=SEED, lr=3e-4, epoch=WARM_EPOCHS,
        ocr="Tesseract", std=3, random_std=True, dataset="pos",
        crnn_model_path=os.path.join(ckpt_dir, "model"),
        ckpt_path=None, start_epoch=0, data_base_path=world,
        train_subset=None, val_subset=None)
    t0 = time.time()
    trainer = TrainCRNN(args)
    best_acc, best_epoch = trainer.train()
    warm_calls = trainer.ocr.count_calls
    ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "model_*")),
                   key=os.path.getmtime)
    print(f"[verbatim-warmup] best CRNN-vs-OCR acc {best_acc:.3f} @ "
          f"{best_epoch}; {warm_calls} bb calls; {time.time() - t0:.0f}s "
          f"-> {ckpts[-1]}", flush=True)
    return ckpts[-1]


def run_patch(world: str, cers_path: str, crnn_ckpt: str | None,
              prep_ckpt: str | None = None):
    """Verbatim `train_nn_patch.TrainNNPrep.train()`."""
    import wandb  # the recording stub

    from train_nn_patch import TrainNNPrep

    exp = os.path.join(OUT, "exp")
    os.makedirs(exp, exist_ok=True)
    args = argparse.Namespace(
        # experiment knobs (mirroring scripts/quality_run.py)
        epoch=PATCH_EPOCHS, lr_crnn=1e-4, lr_prep=5e-5, weight_decay=5e-4,
        scalar=0.1, std=3, random_std=True, inner_limit=INNER_LIMIT,
        inner_limit_skip=True, minibatch_subset="rangeCER",
        minibatch_subset_prop=BUDGET_PROP, window_size=WINDOW_SIZE,
        weightgen_method="decaying", decay_factor=0.7,
        cers_ocr_path=cers_path, crnn_model=crnn_ckpt, prep_model=prep_ckpt,
        data_base_path=world, exp_base_path=exp, ocr="Tesseract",
        # patch_cli.py defaults for the rest
        random_seed=SEED, start_epoch=0, warmup_epochs=0,
        train_subset_size=None, val_subset_size=None, image_prop=None,
        update_CRNN=False, optim_crnn_path=None, optim_prep_path=None,
        pruning_artifact=None, query_dim=32, emb_dim=256,
        attn_activation="sigmoid", discount_factor=1,
        exp_name="ref_verbatim", exp_id=None)
    t0 = time.time()
    trainer = TrainNNPrep(args)

    # dataset-name differential: the seed-CER keys must exactly cover the
    # reference dataset's strip names
    ref_names = reference_names(trainer.dataset)
    cer_names = set(trainer.cers)
    assert ref_names == cer_names, (
        f"strip-name mismatch: {len(ref_names ^ cer_names)} differ; "
        f"e.g. {sorted(ref_names - cer_names)[:3]} vs "
        f"{sorted(cer_names - ref_names)[:3]}")
    print(f"[verbatim-patch] {len(ref_names)} strip names match the "
          "seed-CER JSON exactly", flush=True)

    best_acc, best_epoch = trainer.train()
    wall = time.time() - t0

    # ledger: the reference's own logged metrics vs the budget formula
    per_doc = INNER_LIMIT * math.ceil(STRIPS_PER_DOC * (1 - BUDGET_PROP))
    expect_epoch = per_doc * TRAIN_DOCS
    for rec in wandb.logged:
        assert rec["Black-Box Calls"] == expect_epoch, (
            rec["Black-Box Calls"], expect_epoch)
    print(f"[verbatim-patch] best val OCR acc {best_acc:.3f} @ epoch "
          f"{best_epoch}; epoch ledger {expect_epoch} (formula exact, "
          f"{len(wandb.logged)} epochs); total bb calls "
          f"{trainer.ocr.count_calls}; {wall:.0f}s", flush=True)
    return best_acc, best_epoch, wandb.logged, exp


def run_eval(world: str, exp: str):
    """Verbatim `eval_prep.EvalPrep.eval_patch()` on the held-out split."""
    from eval_prep import EvalPrep

    best = os.path.join(exp, "ckpts", "Prep_model_best")
    if not os.path.exists(best):
        import glob
        best = sorted(glob.glob(os.path.join(exp, "ckpts", "Prep_model_*")),
                      key=os.path.getmtime)[-1]
    args = argparse.Namespace(
        batch_size=64, show_txt=False, show_img=False, prep_path=best,
        ocr="Tesseract", dataset="patch_dataset", data_base_path=world,
        show_orig=True)
    ev = EvalPrep(args)
    acc, cer = ev.eval()
    return acc, cer


def pretrain_prep(world: str, out_path: str, epochs: int) -> str:
    """Identity-pretrain the REFERENCE UNet on the train documents — the
    `--prep_model` warm-start artifact the reference loads from a prior
    run (`train_nn_patch.py:96-99`). Same recipe as the rebuild's
    `prep_pretrain_epochs` (MSE(prep(x), x), Adam 1e-3) and the area
    harnesses' PREP_PRETRAIN: a randomly-initialized UNet emits unreadable
    mid-gray strips and the budget loop cannot bootstrap at small scale
    (measured: 48 docs x 10 epochs ends BELOW the original-strip baseline
    without this, 19.5% vs 55.5%)."""
    import torch

    from datasets.patch_dataset import PatchDataset
    from models.model_unet import UNet as RefUNet

    from qea_ocr_tpu.tools.ref_world import PATCH_TRAIN

    ds = PatchDataset(os.path.join(world, PATCH_TRAIN), pad=True,
                      include_name=True)
    imgs = torch.stack([ds[i][0] for i in range(len(ds))])  # (N,1,H,W)
    prep = RefUNet()
    opt = torch.optim.Adam(prep.parameters(), lr=1e-3)
    mse = torch.nn.MSELoss()
    prep.train()
    rng = np.random.default_rng(SEED)
    B = 2
    for pe in range(epochs):
        tot, nb = 0.0, 0
        order = rng.permutation(len(ds))
        for bi in range(0, len(order) - B + 1, B):
            x = imgs[order[bi:bi + B]]
            opt.zero_grad()
            loss = mse(prep(x), x)
            loss.backward()
            opt.step()
            tot += float(loss)
            nb += 1
        print(f"[verbatim] prep-pretrain {pe} mse {tot / max(1, nb):.5f}",
              flush=True)
    torch.save(prep, out_path)
    return out_path


def torch_ckpt_from_orbax(orbax_path: str, out_path: str) -> str:
    """Rebuild the rebuild's warmed proxy as a reference whole-module
    pickle: orbax -> reference-schema state_dict (`tools/export_torch`) ->
    reference `models/model_crnn.CRNN` -> `torch.save(module)` — the exact
    feedback path docs/MIGRATION.md documents. Lets all three quality
    harnesses start from ONE shared TPU-warmed proxy."""
    import torch

    from models.model_crnn import CRNN as RefCRNN

    from qea_ocr_tpu.tools.export_torch import export_crnn

    sd = export_crnn(orbax_path, out_path + ".state_dict")
    m = RefCRNN(95, False)
    m.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd.items()})
    torch.save(m, out_path)
    print(f"[shared-proxy] orbax {orbax_path} -> reference module "
          f"{out_path}", flush=True)
    return out_path


def main():
    t0 = time.time()
    os.makedirs(OUT, exist_ok=True)
    world, cers_path, _names = build_world()

    from qea_ocr_tpu.tools.ref_shims import enter_reference
    enter_reference()
    import properties
    properties.num_workers = 0  # 1-core box: in-process DataLoader

    if os.environ.get("CRNN_ORBAX_CKPT"):
        crnn_ckpt = torch_ckpt_from_orbax(
            os.environ["CRNN_ORBAX_CKPT"], os.path.join(OUT, "crnn_shared"))
    else:
        crnn_ckpt = os.environ.get("CRNN_TORCH_CKPT") or run_warmup(world)
    pre_epochs = int(os.environ.get("PREP_PRETRAIN", 0))
    prep_ckpt = (pretrain_prep(world, os.path.join(OUT, "prep_warmstart"),
                               pre_epochs) if pre_epochs else None)
    best_acc, best_epoch, logged, exp = run_patch(world, cers_path,
                                                  crnn_ckpt, prep_ckpt)
    acc, cer = run_eval(world, exp)

    summary = dict(
        harness="reference_verbatim",
        cleaned_acc=round(acc, 4), cleaned_cer=round(cer, 4),
        best_train_val_acc=round(best_acc, 4), best_epoch=best_epoch,
        budget=round(1.0 - BUDGET_PROP, 4), train_docs=TRAIN_DOCS,
        strips_per_doc=STRIPS_PER_DOC, patch_epochs=PATCH_EPOCHS,
        epoch_bb_calls=logged[-1]["Black-Box Calls"] if logged else None,
        total_seconds=round(time.time() - t0, 1))
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("[summary]", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
