"""Reference AREA-algorithm quality parity harness (PyTorch, CPU).

Counterpart of benchmarks/torch_reference_quality.py for the word-crop
path: an independent PyTorch implementation of the reference
`train_nn_area.py` training semantics (written from the SURVEY spec, not
copied) on the SAME hermetic synthetic world + FakeOCR that
`scripts/quality_run_area.py` uses, so the rebuild's area
accuracy-at-budget point can be compared against the actual reference
semantics at equal OCR query budget:

  1. CRNN warmup on word crops labeled by FakeOCR (train_crnn.py parity —
     shared with the patch harness's warmup_crnn).
  2. Budget-aware area training: batches of word crops straight through
     the UNet, per-minibatch rangeCER selection of ceil(B*(1-prop)) crops,
     inner loop (label-tracking weighted CTC + Gaussian-jitter CTC), one
     CRNN Adam step per batch; then prep update with BN-frozen CRNN,
     CTC(GT) + scalar*MSE(img, white)      (reference train_nn_area.py:193-318)
     FAITHFULLY including the reference's inner-loop quirk: loss.backward()
     sits OUTSIDE the inner loop (train_nn_area.py:272-274), so with
     inner_limit=2 only the LAST (jitter) round's loss is backpropagated —
     the tracking round burns OCR budget but contributes no gradient. The
     rebuild fixes this (shared phase A accumulates all rounds; PARITY.md
     reference-defects note).
  3. Validation per epoch: FakeOCR accuracy on cleaned crops, batched with
     drop_last=True (train_nn_area.py:137); best checkpoint by OCR acc.
  4. Held-out eval: FakeOCR exact-match acc + CER on cleaned vs original
     crops (eval_prep.py area path).

World parameters mirror scripts/quality_run_area.py (train seed 42 / val
43 / eval 1234, calibrated corruption, budget, window). Usage:

  BUDGET_PROP=0.75 AREA_EPOCHS=30 \
      python benchmarks/torch_reference_quality_area.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- world config (keep in lockstep with scripts/quality_run_area.py) ------
CORRUPTION = json.loads(os.environ.get(
    "CORRUPTION",
    '{"noise_std": 0.14, "shading": 0.18, "salt_pepper": 0.007}'))
# The warmup world IS the area world (crops at the same corruption).
os.environ.setdefault("WARMUP_CORRUPTION", json.dumps(CORRUPTION))
BUDGET_PROP = float(os.environ.get("BUDGET_PROP", 0.75))
TRAIN_SIZE = int(os.environ.get("TRAIN_SIZE", 2048))
VAL_SIZE = int(os.environ.get("VAL_SIZE", 256))
EVAL_SIZE = int(os.environ.get("EVAL_SIZE", 256))
BATCH = int(os.environ.get("BATCH", 64))
AREA_EPOCHS = int(os.environ.get("AREA_EPOCHS", 30))
WINDOW_SIZE = int(os.environ.get("WINDOW_SIZE", 3))
INNER_LIMIT = 2
SEC_LOSS_SCALAR = float(os.environ.get("SCALAR", 1.0))
LR_PREP = float(os.environ.get("LR_PREP", 2e-5))
LR_CRNN = float(os.environ.get("LR_CRNN", 1e-4))
OUT = os.environ.get("QUALITY_OUT", "/tmp/torch_ref_quality_area")
SEED = 42


def area_train(charmap, ocr, crnn, train_set, val_set):
    """The reference per-minibatch budget loop (train_nn_area.py:193-318)."""
    import torch

    from benchmarks.torch_baseline import build_models
    from benchmarks.torch_reference_quality import (
        RangeCerSampler, add_noise, compare_labels, encode_targets,
        gen_decaying_weights, greedy_decode, levenshtein)

    prep, _ = build_models(charmap.vocab_size)
    # reference area_cli defaults: Adam + weight_decay (train_nn_area.py
    # mirrors train_nn_patch's optimizer construction)
    opt_crnn = torch.optim.Adam(crnn.parameters(), lr=LR_CRNN,
                                weight_decay=5e-4)
    opt_prep = torch.optim.Adam(prep.parameters(), lr=LR_PREP,
                                weight_decay=5e-4)
    ctc = torch.nn.CTCLoss(blank=charmap.blank_id, zero_infinity=True)
    mse = torch.nn.MSELoss()

    imgs = np.stack([s.image for s in train_set.samples])
    texts = [s.label for s in train_set.samples]
    names = [s.name for s in train_set.samples]
    va_imgs = np.stack([s.image for s in val_set.samples])
    va_texts = [s.label for s in val_set.samples]

    # Identity pretraining of the prep (MSE(prep(x), x), Adam 1e-3) —
    # the torch analogue of the rebuild's `prep_pretrain_epochs` and of
    # the reference's `--prep_model` warm start (`train_nn_area.py` loads
    # a prior run's preprocessor; a randomly-initialized UNet emits
    # unreadable mid-gray crops and the budget loop cannot bootstrap —
    # measured: val acc flat at 0.000 for 4 epochs without this).
    pre_epochs = int(os.environ.get("PREP_PRETRAIN", 0))
    if pre_epochs:
        pre_opt = torch.optim.Adam(prep.parameters(), lr=1e-3)
        prep.train()
        for pe in range(pre_epochs):
            tot = 0.0
            order = np.random.permutation(len(train_set))
            for bi in range(0, len(order) - BATCH + 1, BATCH):
                x = torch.tensor(imgs[order[bi:bi + BATCH]][:, None])
                pre_opt.zero_grad()
                out = prep(x)
                loss = mse(out, x)
                loss.backward()
                pre_opt.step()
                tot += float(loss)
            print(f"[torch-area] prep-pretrain {pe} mse "
                  f"{tot / max(1, len(order) // BATCH):.5f}", flush=True)

    sampler = RangeCerSampler({})
    tracked: dict = {}
    best_acc, best_epoch, best_state = 0.0, 0, None
    total_bb = 0

    for epoch in range(AREA_EPOCHS):
        t_ep = time.time()
        epoch_bb = 0
        order = np.random.permutation(len(train_set))
        for bi in range(0, len(order) - BATCH + 1, BATCH):  # drop_last=True
            idx = order[bi:bi + BATCH]
            batch_imgs = torch.tensor(imgs[idx][:, None])
            batch_texts = [texts[j] for j in idx]
            batch_names = [names[j] for j in idx]

            # ------------- phase A: proxy update ------------------------
            crnn.train(); prep.eval()
            opt_crnn.zero_grad(); opt_prep.zero_grad()
            with torch.no_grad():
                cleaned = prep(batch_imgs)
            num_bb = max(1, math.ceil(BATCH * (1 - BUDGET_PROP)))
            picked = sampler.query(batch_names, num_bb)
            sel = cleaned[picked].detach()
            sel_names = [batch_names[k] for k in picked]

            loss = None
            for i in range(INNER_LIMIT):
                if i == 0:  # label-tracking round
                    ocr_labels = ocr.get_labels(sel.numpy()[:, 0])
                    weights = gen_decaying_weights(WINDOW_SIZE)
                    for nm, lb in zip(sel_names, ocr_labels):
                        tracked.setdefault(nm, []).append(lb)
                    scores = crnn(sel)
                    pred_len = torch.full((scores.shape[1],),
                                          scores.shape[0], dtype=torch.long)
                    loss = 0.0
                    for depth in range(WINDOW_SIZE):
                        idxs = [k for k, nm in enumerate(sel_names)
                                if len(tracked.get(nm, [])) > depth]
                        if not idxs:
                            continue
                        t_texts = [tracked[sel_names[k]][-depth - 1]
                                   for k in idxs]
                        y, y_len = encode_targets(t_texts, charmap)
                        loss = loss + weights[depth] * ctc(
                            scores[:, idxs], y, pred_len[idxs], y_len)
                else:       # jitter round
                    noisy = add_noise(sel)
                    ocr_labels = ocr.get_labels(noisy.numpy()[:, 0])
                    scores = crnn(noisy)
                    y, y_len = encode_targets(ocr_labels, charmap)
                    pred_len = torch.full((scores.shape[1],),
                                          scores.shape[0], dtype=torch.long)
                    loss = ctc(scores, y, pred_len, y_len)
                epoch_bb += sel.shape[0]
                total_bb += sel.shape[0]
            # REFERENCE QUIRK: backward OUTSIDE the inner loop
            # (train_nn_area.py:272-274) — only the last round's loss
            # reaches the optimizer.
            if isinstance(loss, torch.Tensor):
                loss.backward()
            opt_crnn.step()

            # ------------- phase B: prep update --------------------------
            prep.train(); crnn.train()
            for m in crnn.modules():  # set_bn_eval parity
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.eval()
            opt_prep.zero_grad(); opt_crnn.zero_grad()
            img_out = prep(batch_imgs)
            scores = crnn(img_out)
            y, y_len = encode_targets(batch_texts, charmap)
            pred_len = torch.full((scores.shape[1],), scores.shape[0],
                                  dtype=torch.long)
            loss = ctc(scores, y, pred_len, y_len) + \
                SEC_LOSS_SCALAR * mse(img_out, torch.ones_like(img_out))
            loss.backward()
            preds = greedy_decode(scores, charmap)
            cers = [levenshtein(p, g) / max(1, len(g))
                    for p, g in zip(preds, batch_texts)]
            sampler.update_cer(cers, batch_names)
            opt_prep.step()

        # ------------- validation (drop_last=True parity) ---------------
        prep.eval(); crnn.eval()
        v_crt, v_cnt = 0, 0
        with torch.no_grad():
            for bi in range(0, len(val_set) - BATCH + 1, BATCH):
                b = torch.tensor(va_imgs[bi:bi + BATCH][:, None])
                cleaned = prep(b)
                labels = ocr.get_labels(cleaned.numpy()[:, 0])
                crt, _ = compare_labels(labels, va_texts[bi:bi + BATCH])
                v_crt += crt
                v_cnt += BATCH
        acc = v_crt / max(1, v_cnt)
        print(f"[torch-area] epoch {epoch} val OCR acc {acc:.3f} "
              f"bb {epoch_bb} ({time.time() - t_ep:.0f}s)", flush=True)
        if acc > best_acc:
            best_acc, best_epoch = acc, epoch
            best_state = {k: v.clone() for k, v in prep.state_dict().items()}
    if best_state is not None:
        prep.load_state_dict(best_state)
    return prep, best_acc, best_epoch, total_bb


def held_out_eval(charmap, prep, eval_set):
    """eval_prep area-path scoring: FakeOCR on cleaned and original crops,
    eval-mode OCR (no label normalization)."""
    import torch

    from benchmarks.torch_reference_quality import compare_labels
    from qea_ocr_tpu.ocr.base import get_ocr_helper

    ocr = get_ocr_helper("Fake", is_eval=True)
    imgs = np.stack([s.image for s in eval_set.samples])
    texts = [s.label for s in eval_set.samples]
    cl_crt = cl_cer = or_crt = or_cer = 0.0
    with torch.no_grad():
        for bi in range(0, len(eval_set), BATCH):
            chunk = imgs[bi:bi + BATCH]
            gts = texts[bi:bi + BATCH]
            o_lbl = ocr.get_labels(chunk)
            crt, cer = compare_labels(o_lbl, gts)
            or_crt += crt; or_cer += cer
            cleaned = prep(torch.tensor(chunk[:, None]))
            c_lbl = ocr.get_labels(cleaned.numpy()[:, 0])
            crt, cer = compare_labels(c_lbl, gts)
            cl_crt += crt; cl_cer += cer
    n = max(1, len(eval_set))
    return dict(cleaned_acc=cl_crt / n, cleaned_cer=cl_cer / n,
                orig_acc=or_crt / n, orig_cer=or_cer / n)


def main():
    import torch

    from benchmarks.torch_reference_quality import warmup_crnn
    from qea_ocr_tpu.data.datasets import SyntheticWordDataset
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    from qea_ocr_tpu.utils.charmap import CharMap

    os.makedirs(OUT, exist_ok=True)
    torch.manual_seed(SEED)
    np.random.seed(SEED)
    t0 = time.time()

    charmap = CharMap.default()
    ocr = get_ocr_helper("Fake")
    # TORCH_CRNN_SD: start from an exported proxy (tools/export_torch.py,
    # reference CRNN_model state_dict schema) instead of warming up here —
    # lets the torch reference harness and the TPU pipeline share the
    # IDENTICAL warmed proxy, removing warmup quality as a confounder in
    # the head-to-head (the torch CTC warmup needs thousands of optimizer
    # steps to converge on this one-core host; the shared proxy costs
    # neither side anything).
    sd_path = os.environ.get("TORCH_CRNN_SD")
    if sd_path:
        from benchmarks.torch_baseline import build_models
        from qea_ocr_tpu.tools.export_torch import load_into_twin_crnn
        _, crnn = build_models(charmap.vocab_size)
        sd = torch.load(sd_path, map_location="cpu", weights_only=False)
        load_into_twin_crnn(crnn, {k: np.asarray(v) for k, v in sd.items()})
        print(f"[torch-warmup] loaded shared proxy {sd_path}", flush=True)
    else:
        crnn, warm_acc = warmup_crnn(charmap, ocr)
        print(f"[torch-warmup] best acc {warm_acc:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    train_set = SyntheticWordDataset(TRAIN_SIZE, seed=SEED,
                                     corruption=CORRUPTION)
    val_set = SyntheticWordDataset(VAL_SIZE, seed=SEED + 1,
                                   corruption=CORRUPTION)
    eval_set = SyntheticWordDataset(EVAL_SIZE, seed=1234,
                                    corruption=CORRUPTION)

    prep, best_acc, best_epoch, total_bb = area_train(
        charmap, ocr, crnn, train_set, val_set)
    print(f"[torch-area] best val acc {best_acc:.3f} @ {best_epoch}, "
          f"total bb calls {total_bb} ({time.time() - t0:.0f}s)", flush=True)

    result = held_out_eval(charmap, prep, eval_set)
    result.update(best_train_val_acc=best_acc,
                  budget=round(1 - BUDGET_PROP, 4),
                  train_size=TRAIN_SIZE, epochs=AREA_EPOCHS,
                  total_seconds=round(time.time() - t0, 1),
                  impl="torch-reference-area")
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("[torch-ref-area summary]", json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
