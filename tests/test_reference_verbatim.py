"""The REFERENCE CODE as the parity oracle, at test scale.

These tests import `/root/reference`'s own modules (via the dependency
shims in `qea_ocr_tpu/tools/ref_shims.py`) and assert the rebuild against
the artifact itself, not against a description of it:

  * dataset-layer differential: reference `PatchDataset` (+ `collate` +
    `get_text_stack`) vs the rebuild's `PatchDocuments` on the SAME
    on-disk tree — document pixels, strip labels, box geometry, crop
    pixels, and strip names item-by-item;
  * edge-case dress rehearsal: both sidecar schemas, >100-char labels,
    >=(32,128) boxes, a zero-surviving-strips document (dummy-strip
    path), odd non-(400,512) geometry with padding offsets — both
    loaders must agree on every filter decision;
  * a micro verbatim `TrainNNPrep` run (2 docs, 1 epoch) with seed CERs
    from the rebuild's `cer_seed` tool: exact budget ledger, finite
    losses, reference-format side-state written.

The full-scale harness is `benchmarks/reference_verbatim.py`.
"""

import json
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REF = os.environ.get("QEA_REFERENCE_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference repo not present")

CORRUPTION = dict(noise_std=0.18, shading=0.25, salt_pepper=0.01)


@pytest.fixture(scope="module")
def reference():
    """Enter the reference repo (shims + sys.path + cwd); restore cwd and
    REMOVE the dependency stubs at teardown so later tests probing for the
    real deps (optuna/wandb/...) see honest ImportErrors again."""
    from qea_ocr_tpu.tools.ref_shims import (
        enter_reference, remove_reference_shims)
    prev = enter_reference(_REF)
    import properties
    properties.num_workers = 0
    yield _REF
    os.chdir(prev)
    remove_reference_shims()


def _write_world(tmp_path, n_docs=4, n_strips=3, doc_size=(400, 512)):
    from qea_ocr_tpu.tools.ref_world import write_patch_split
    split = tmp_path / "patch_dataset_train"
    write_patch_split(str(split), n_docs, seed=7, n_strips=n_strips,
                      corruption=CORRUPTION, doc_size=doc_size)
    return str(split)


def test_dataset_differential_itemwise(reference, tmp_path):
    """Same tree through both data layers: everything must match."""
    from datasets.patch_dataset import PatchDataset

    from qea_ocr_tpu.data.datasets import PatchDocuments
    from qea_ocr_tpu.ops.text_stack import get_text_stack
    import jax.numpy as jnp

    split = _write_world(tmp_path)
    ref_ds = PatchDataset(split, pad=True, include_name=True)
    ours = PatchDocuments(split, max_strips=8)
    assert len(ref_ds) == len(ours) == 4

    ours_by_name = {s.doc_name.split("/")[-1]: s for s in ours.samples}
    for i in range(len(ref_ds)):
        img_t, labels_dict, name = ref_ds[i]
        stem = os.path.splitext(os.path.basename(name))[0]
        mine = ours_by_name[stem]

        # document pixels (both read uint8 PNG / 255)
        np.testing.assert_allclose(
            img_t.numpy()[0], mine.image, atol=1e-7)

        # strip count, labels, geometry — item by item
        rows = np.nonzero(mine.strip_mask)[0]
        assert len(labels_dict) == len(rows)
        folder = os.path.basename(os.path.dirname(name))
        for j, (lbl, r) in enumerate(zip(labels_dict, rows)):
            assert (lbl["x_min"], lbl["y_min"], lbl["x_max"], lbl["y_max"]) \
                == tuple(mine.bboxes[r].tolist())
            gt = ours.charmap.decode(mine.gt_labels[r][None],
                                     mine.gt_lengths[r][None])[0]
            assert lbl["label"] == gt
            assert mine.strip_names[r] == f"{j}_{lbl['label']}_{folder}_{stem}"

        # crop pixels: reference crop+pad vs the rebuild's device gather
        import utils as ref_utils
        ref_crops, _ = ref_utils.get_text_stack(
            img_t, labels_dict, (32, 128))
        my_crops = np.asarray(get_text_stack(
            jnp.asarray(mine.image), jnp.asarray(mine.bboxes[rows])))
        np.testing.assert_allclose(
            ref_crops.numpy()[:, 0], my_crops.reshape(-1, 32, 128), atol=1e-6)

    # reference static collate stacks what our batch layer stacks
    batch = PatchDataset.collate([ref_ds[i] for i in range(2)])
    assert batch[0].shape == (2, 1, 400, 512) and len(batch[1]) == 2


def test_edge_case_dress_rehearsal(reference, tmp_path):
    """Both schemas + every filter rule + dummy strip + odd geometry."""
    from PIL import Image

    from datasets.patch_dataset import PatchDataset
    from qea_ocr_tpu.data.datasets import PatchDocuments

    d = tmp_path / "patch_dataset_train" / "edge"
    d.mkdir(parents=True)

    # odd geometry: 300x300 doc -> padded into the (400, 512) canvas with
    # offsets (top (400-300)//2=50, left (512-300)//2=106)
    img = (np.random.default_rng(0).random((300, 300)) * 255).astype("uint8")
    Image.fromarray(img, "L").save(d / "odd.png")
    sidecar = [
        {"label": "KEEP", "x_min": 10, "y_min": 10, "x_max": 60, "y_max": 30},
        {"label": "X" * 101,                      # >100 chars -> filtered
         "x_min": 10, "y_min": 40, "x_max": 60, "y_max": 60},
        {"label": "WIDE",                         # width 128 !< 128 -> filtered
         "x_min": 0, "y_min": 70, "x_max": 128, "y_max": 90},
        {"label": "TALL",                         # height 32 !< 32 -> filtered
         "x_min": 10, "y_min": 100, "x_max": 60, "y_max": 132},
    ]
    (d / "odd.json").write_text(json.dumps(sidecar))

    # 4-corner schema file whose every strip is filtered -> dummy strip
    img2 = np.full((400, 512), 255, "uint8")
    Image.fromarray(img2, "L").save(d / "empty.png")
    (d / "empty.json").write_text(json.dumps([
        {"label": "Y" * 200,
         "x1": 5, "y1": 5, "x2": 50, "y2": 5,
         "x3": 50, "y3": 20, "x4": 5, "y4": 20},
    ]))

    split = str(tmp_path / "patch_dataset_train")
    ref_ds = PatchDataset(split, pad=True, include_name=True)
    ours = PatchDocuments(split, max_strips=8)
    ref = {os.path.splitext(os.path.basename(n))[0]: lbls
           for _, lbls, n in (ref_ds[i] for i in range(len(ref_ds)))}
    mine = {s.doc_name.split("/")[-1]: s for s in ours.samples}

    # odd.png: only KEEP survives, offset by the padding
    assert [x["label"] for x in ref["odd"]] == ["KEEP"]
    keep = ref["odd"][0]
    assert (keep["x_min"], keep["y_min"]) == (10 + 106, 10 + 50)
    s = mine["odd"]
    assert int(s.strip_mask.sum()) == 1
    assert tuple(s.bboxes[0].tolist()) == (
        keep["x_min"], keep["y_min"], keep["x_max"], keep["y_max"])

    # empty.png: dummy ' ' strip in both loaders
    assert [x["label"] for x in ref["empty"]] == [" "]
    assert (ref["empty"][0]["x_min"], ref["empty"][0]["x_max"]) == (0, 127)
    s = mine["empty"]
    assert int(s.strip_mask.sum()) == 1
    assert tuple(s.bboxes[0].tolist()) == (0, 0, 127, 31)
    assert ours.charmap.decode(s.gt_labels[:1], s.gt_lengths[:1]) == [" "]


def test_verbatim_micro_train(reference, tmp_path):
    """2-doc/1-epoch verbatim `TrainNNPrep.train()`: exact ledger, finite
    losses, side-state files in the reference's format."""
    import wandb  # recording stub

    from train_nn_patch import TrainNNPrep

    import jax
    from qea_ocr_tpu.data.datasets import PatchDocuments
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    from qea_ocr_tpu.ocr.engine import OcrQueryEngine
    from qea_ocr_tpu.tools.cer_seed import seed_patch
    from qea_ocr_tpu.tools.ref_world import write_patch_split
    from qea_ocr_tpu.utils.charmap import CharMap

    docs, strips, prop = 2, 3, 0.5
    world = tmp_path / "world"
    write_patch_split(str(world / "patch_dataset_train"), docs, seed=11,
                      n_strips=strips, corruption=CORRUPTION)
    write_patch_split(str(world / "patch_dataset_dev"), 1, seed=12,
                      n_strips=strips, corruption=CORRUPTION)

    cm = CharMap.default()
    ds = PatchDocuments.synthetic(docs, seed=11, n_strips=strips,
                                  max_strips=strips, corruption=CORRUPTION)
    cers = seed_patch(ds, OcrQueryEngine(get_ocr_helper("Fake"), cm), cm)
    cers_path = tmp_path / "cers.json"
    cers_path.write_text(json.dumps(cers))

    import argparse
    exp = tmp_path / "exp"
    exp.mkdir()
    args = argparse.Namespace(
        epoch=1, lr_crnn=1e-4, lr_prep=5e-5, weight_decay=5e-4, scalar=0.1,
        std=3, random_std=True, inner_limit=2, inner_limit_skip=True,
        minibatch_subset="rangeCER", minibatch_subset_prop=prop,
        window_size=2, weightgen_method="decaying", decay_factor=0.7,
        cers_ocr_path=str(cers_path), crnn_model=None, prep_model=None,
        data_base_path=str(world), exp_base_path=str(exp), ocr="Tesseract",
        random_seed=42, start_epoch=0, warmup_epochs=0,
        train_subset_size=None, val_subset_size=None, image_prop=None,
        update_CRNN=False, optim_crnn_path=None, optim_prep_path=None,
        pruning_artifact=None, query_dim=32, emb_dim=256,
        attn_activation="sigmoid", discount_factor=1,
        exp_name="t", exp_id=None)
    n_before = len(wandb.logged)
    trainer = TrainNNPrep(args)
    # seed-CER keys cover the on-disk names exactly (cross-tool contract)
    assert set(trainer.cers) == set(cers)
    trainer.train()

    rec = wandb.logged[-1]
    assert len(wandb.logged) == n_before + 1
    per_doc = 2 * math.ceil(strips * (1 - prop))      # inner_limit * k
    assert rec["Black-Box Calls"] == per_doc * docs
    assert rec["Train + Val BB Calls"] == per_doc * docs + 1 * strips
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])
    # reference-format side-state + whole-module checkpoints on disk
    assert (exp / "tracked_labels" / "tracked_labels_current.json").exists()
    assert (exp / "cers" / "all_cers.json").exists()
    assert (exp / "ckpts" / "CRNN_model_0").exists()
    prep_ckpts = [p for p in (exp / "ckpts").iterdir()
                  if p.name.startswith("Prep_model_")]
    assert prep_ckpts
    # the whole-module pickle loads back (torch.load shim default)
    m = torch.load(prep_ckpts[0])
    assert hasattr(m, "forward")


def test_verbatim_area_micro_train(reference, tmp_path):
    """1-epoch verbatim `train_nn_area.TrainNNPrep.train()` on an on-disk
    word world: exact per-batch budget ledger, seed-CER name contract,
    finite losses."""
    import argparse

    import wandb  # recording stub

    import train_nn_area

    from qea_ocr_tpu.data.datasets import ImgDataset
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    from qea_ocr_tpu.ocr.engine import OcrQueryEngine
    from qea_ocr_tpu.tools.cer_seed import seed_area
    from qea_ocr_tpu.tools.ref_world import (
        VGG_DEV, VGG_TRAIN, write_word_split)
    from qea_ocr_tpu.utils.charmap import CharMap

    corr = dict(noise_std=0.1, shading=0.12, salt_pepper=0.0)
    world = tmp_path / "world"
    B, prop = 8, 0.5
    write_word_split(str(world / VGG_TRAIN), 24, seed=5, corruption=corr)
    write_word_split(str(world / VGG_DEV), 16, seed=6, corruption=corr)

    cm = CharMap.default()
    ds = ImgDataset(str(world / VGG_TRAIN))
    cers = seed_area(ds, OcrQueryEngine(get_ocr_helper("Fake"), cm), cm)
    cers_path = tmp_path / "cers.json"
    cers_path.write_text(json.dumps(cers))

    exp = tmp_path / "exp"
    exp.mkdir()
    args = argparse.Namespace(
        batch_size=B, lr_crnn=1e-4, lr_prep=5e-5, scalar=1.0, epoch=1,
        warmup_epochs=0, std=3, random_std=True, inner_limit=2,
        inner_limit_skip=True, crnn_model=None, prep_model=None,
        data_base_path=str(world), exp_base_path=str(exp), ocr="Tesseract",
        minibatch_subset="rangeCER", minibatch_subset_prop=prop,
        start_epoch=0, train_subset_size=None, val_subset_size=None,
        lr_scheduler=None, cers_ocr_path=str(cers_path),
        weightgen_method="decaying", window_size=2, decay_factor=0.7,
        random_seed=42, exp_name="t", exp_id=None, update_CRNN=False,
        query_dim=32, emb_dim=256, attn_activation="sigmoid",
        discount_factor=1)
    trainer = train_nn_area.TrainNNPrep(args)
    assert {os.path.basename(f) for f in trainer.train_set.files} == set(cers)
    n_before = len(wandb.logged)
    trainer.train()

    rec = wandb.logged[-1]
    assert len(wandb.logged) == n_before + 1
    n_batches = len(trainer.train_set) // B
    assert n_batches >= 2
    assert rec["Black-Box Calls"] == 2 * math.ceil(B * (1 - prop)) * n_batches
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])
    assert (exp / "ckpts" / "CRNN_model_0").exists()


def test_weightgen_and_weighted_ctc_loss_differential(reference):
    """DIRECT numerical differential of the tracking-loss semantics against
    the reference's own functions on identical inputs: the levenshtein
    weight generator (`label_tracking/tracking_methods.py:60-99`) and
    `weighted_ctc_loss` + `generate_ctc_target_batches`
    (`tracking_utils.py:42-75`), in the trainer's exact order (weights from
    PRE-append history, then append the fresh OCR label, then build depth
    targets — `train_nn_patch.py:282-285`). Both the per-sample
    (levenshtein) and the decaying reductions must match to float
    tolerance."""
    import argparse

    import label_tracking.tracking_methods as ref_methods
    import tracking_utils as ref_tracking

    import jax
    import jax.numpy as jnp
    from qea_ocr_tpu.tracking.history import LabelHistory
    from qea_ocr_tpu.tracking.loss import weighted_ctc_loss as our_loss
    from qea_ocr_tpu.tracking.weights import (
        decaying_weights, levenshtein_weights)
    from qea_ocr_tpu.utils.charmap import CharMap

    cm = CharMap.default()
    W, T, V = 2, 31, cm.vocab_size
    pre_history = {"a": ["AB", "CD", "EF"], "b": ["XY"], "c": []}
    names = ["a", "b", "c"]
    fresh = ["AB", "XZ", "QQ"]
    B = len(names)
    rng = np.random.default_rng(0)
    scores_np = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, B, V)).astype(np.float32)), axis=2))

    # ---------------- reference side -----------------------------------
    import utils as ref_utils
    c2i, _i2c, vocab = ref_utils.get_char_maps(
        __import__("properties").char_set)
    assert vocab == V

    class Obj:
        pass

    obj = Obj()
    obj.window_size = W
    obj.char_to_index = c2i
    obj.device = torch.device("cpu")
    obj.tracked_labels = {k: list(v) for k, v in pre_history.items()}
    obj.primary_loss_fn = torch.nn.CTCLoss()
    obj.primary_loss_fn_sample_wise = torch.nn.CTCLoss(reduction="none")

    gen = ref_methods.LevenshteinWeightGenerator(
        argparse.Namespace(window_size=W), obj.device)
    ref_w = gen.gen_weights(obj.tracked_labels, names)      # PRE-append
    ref_tracking.add_labels_to_history(obj, names, fresh)
    batches = ref_tracking.generate_ctc_target_batches(obj, names)
    scores_t = torch.tensor(scores_np)
    pred_size = torch.full((B,), T, dtype=torch.int)

    obj.weightgen_method = "levenshtein"
    ref_lev = float(ref_tracking.weighted_ctc_loss(
        obj, scores_t, pred_size, batches, ref_w))

    obj.weightgen_method = "decaying"
    decay = torch.tensor([0.7 ** i for i in range(W)])
    ref_dec = float(ref_tracking.weighted_ctc_loss(
        obj, scores_t, pred_size, batches, decay))

    # ---------------- rebuild side --------------------------------------
    hist = LabelHistory(B, W, charmap=cm)
    for sid, name in enumerate(names):
        for text in pre_history[name]:      # oldest -> newest
            e, ln = cm.encode([text])
            hist.add(np.asarray([sid]), e, ln, [text])
    labs_pre, lens_pre, valid_pre = hist.gather(np.arange(B))
    our_w = levenshtein_weights(jnp.asarray(labs_pre), jnp.asarray(lens_pre),
                                jnp.asarray(valid_pre))
    # weight-generator differential: (B, W+1), element by element
    np.testing.assert_allclose(np.asarray(our_w), ref_w.numpy(),
                               rtol=1e-5, atol=1e-6)

    e, ln = cm.encode(fresh)
    hist.add(np.arange(B), e, ln, fresh)
    labs, lens, valid = hist.gather(np.arange(B))
    scores_j = jnp.asarray(scores_np)
    our_lev = float(our_loss(
        scores_j, jnp.asarray(labs), jnp.asarray(lens), jnp.asarray(valid),
        our_w, pad_id=cm.pad_id, decaying=False))
    our_dec = float(our_loss(
        scores_j, jnp.asarray(labs), jnp.asarray(lens), jnp.asarray(valid),
        decaying_weights(0.7, W), pad_id=cm.pad_id, decaying=True))

    np.testing.assert_allclose(our_lev, ref_lev, rtol=1e-4)
    np.testing.assert_allclose(our_dec, ref_dec, rtol=1e-4)
