"""Reference-algorithm quality parity harness (PyTorch, CPU).

Runs the REFERENCE's training algorithm — an independent PyTorch
implementation written from the SURVEY spec, not a copy — on the SAME
hermetic synthetic world + FakeOCR the JAX rebuild's quality runs use, so
the rebuild's accuracy-vs-budget point can be compared against the actual
reference semantics at equal OCR query budget:

  1. CRNN warmup on word crops labeled by FakeOCR, noisy train transform,
     StepLR(10, 0.8), best-val checkpoint   (reference train_crnn.py:28-275)
  2. Budget-aware patch training: batch of 1 document, two-phase step —
     phase A: prep.eval forward, strip extraction, rangeCER selection of
     ceil(N*(1-prop)) strips, inner loop (label-tracking weighted CTC on
     the clean pass + Gaussian-jitter CTC rounds), one CRNN Adam step per
     document; phase B: prep.train/crnn BN-frozen, CTC(GT) + scalar*MSE
     (img, white), prep Adam step, CER feedback to the sampler
                                          (reference train_nn_patch.py:193-345)
  3. Validation per epoch: FakeOCR accuracy on cleaned strips; best
     checkpoint by OCR accuracy           (reference train_nn_patch.py:366-398)
  4. Held-out eval: FakeOCR exact-match acc + CER on cleaned vs original
     strips                               (reference eval_prep.py:110-175)

World parameters mirror scripts/quality_run.py (same corruption, budget
floor, strips/doc); sizes are scaled by env knobs so the CPU run finishes
in ~1 h. Run the JAX pipeline at the same scale (quality_run.py honors the
same TRAIN_DOCS/VAL_DOCS/... knobs) for the apples-to-apples row.

Usage:
  BUDGET_PROP=0.75 TRAIN_DOCS=48 PATCH_EPOCHS=10 \
      python benchmarks/torch_reference_quality.py
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- world config (keep in lockstep with scripts/quality_run.py) ----------
CORRUPTION = dict(noise_std=0.18, shading=0.25, salt_pepper=0.01)
WARMUP_CORRUPTION = json.loads(os.environ.get(
    "WARMUP_CORRUPTION",
    '{"noise_std": 0.14, "shading": 0.18, "salt_pepper": 0.007}'))
BUDGET_PROP = float(os.environ.get("BUDGET_PROP", 0.75))
STRIPS_PER_DOC = int(os.environ.get("STRIPS_PER_DOC", 8))
DOC_SIZE = tuple(int(v) for v in os.environ.get("DOC_SIZE", "400,512").split(","))
TRAIN_DOCS = int(os.environ.get("TRAIN_DOCS", 48))
VAL_DOCS = int(os.environ.get("VAL_DOCS", 8))
EVAL_DOCS = int(os.environ.get("EVAL_DOCS", 16))
PATCH_EPOCHS = int(os.environ.get("PATCH_EPOCHS", 10))
WARM_SIZE = int(os.environ.get("WARM_SIZE", 1024))
WARM_EPOCHS = int(os.environ.get("WARM_EPOCHS", 12))
WINDOW_SIZE = int(os.environ.get("WINDOW_SIZE", 3))
INNER_LIMIT = 2
DECAY_FACTOR = 0.7
SEC_LOSS_SCALAR = float(os.environ.get("SCALAR", 0.1))
STD = 3  # jitter noise std (percent, reference AddGaussianNoice semantics)
OUT = os.environ.get("QUALITY_OUT", "/tmp/torch_ref_quality")
SEED = 42


# ---------------------------------------------------------------------------
def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def compare_labels(preds, gts):
    """(exact-match count, summed CER) — reference `utils.py:95-110`."""
    crt, cer = 0, 0.0
    for p, g in zip(preds, gts):
        crt += int(p == g)
        cer += levenshtein(p, g) / max(1, len(g))
    return crt, cer


class RangeCerSampler:
    """rangeCER ('UniformCER') selection — reference selection_utils.py:101-135:
    draw num_samples uniform points over [min, max] of the batch's current
    CERs; each picks the nearest not-yet-picked strip."""

    def __init__(self, seed_cers: dict):
        self.cers = dict(seed_cers)

    def query(self, names, num_samples):
        cers = np.asarray([self.cers.get(n, 1.0) for n in names], np.float64)
        n = len(names)
        num_samples = min(num_samples, n)
        lo, hi = float(cers.min()), float(cers.max())
        points = np.random.uniform(lo, hi, size=num_samples)
        work = cers.copy()
        picked = []
        for p in points:
            idx = int(np.argmin(np.abs(work - p)))
            picked.append(idx)
            work[idx] = 100.0  # sentinel: never re-picked
        return picked

    def update_cer(self, batch_cers, names):
        for c, n in zip(batch_cers, names):
            self.cers[n] = c


def gen_decaying_weights(window):
    return [DECAY_FACTOR ** i for i in range(window)]


# ---------------------------------------------------------------------------
def torch_text_stack(doc, bboxes):
    """Differentiable crop + center-pad-to-white, (1, H, W) doc ->
    (S, 1, 32, 128). Counterpart of reference get_text_stack
    (`utils.py:118-141`)."""
    import torch
    strips = []
    for (x0, y0, x1, y1) in bboxes:
        crop = doc[:, int(y0):int(y1), int(x0):int(x1)]
        ch, cw = crop.shape[1], crop.shape[2]
        pt = (32 - ch) // 2
        pl = (128 - cw) // 2
        canvas = torch.ones(1, 32, 128, dtype=doc.dtype)
        canvas[:, pt:pt + ch, pl:pl + cw] = crop
        strips.append(canvas)
    return torch.stack(strips)


def greedy_decode(scores, charmap):
    """(T, B, V) log-probs -> strings (collapse repeats, drop blank=0)."""
    import torch
    ids = torch.argmax(scores, dim=2).cpu().numpy()  # (T, B)
    out = []
    for b in range(ids.shape[1]):
        seq, prev = [], -1
        for t in ids[:, b]:
            if t != prev and t != charmap.blank_id:
                seq.append(int(t))
            prev = t
        out.append("".join(charmap.index_to_char.get(i, "") for i in seq))
    return out


def encode_targets(texts, charmap):
    """strings -> (concat int tensor, lengths) for torch CTCLoss."""
    import torch
    ids, lens = [], []
    for t in texts:
        enc = [charmap.char_to_index[c] for c in charmap.clean(t)
               if c in charmap.char_to_index]
        enc = enc or [charmap.char_to_index[" "]]
        ids.extend(enc)
        lens.append(len(enc))
    return (torch.tensor(ids, dtype=torch.long),
            torch.tensor(lens, dtype=torch.long))


def add_noise(imgs, std=STD, stochastic=True):
    import torch
    s = np.random.uniform(0, std) if stochastic else std
    noise = torch.randn_like(imgs) * (s / 100.0)
    return torch.clamp(imgs - noise, 0.0, 1.0)


# ---------------------------------------------------------------------------
def warmup_crnn(charmap, ocr):
    """Reference train_crnn.py semantics: CRNN alone on word crops, labels
    from the black box (OCRDataset), noisy train/clean val, StepLR(10,0.8),
    keep best val accuracy."""
    import torch
    from benchmarks.torch_baseline import build_models
    from qea_ocr_tpu.data.datasets import SyntheticWordDataset

    _, crnn = build_models(charmap.vocab_size)
    train_set = SyntheticWordDataset(WARM_SIZE, seed=SEED,
                                     corruption=WARMUP_CORRUPTION)
    val_set = SyntheticWordDataset(256, seed=SEED + 1,
                                   corruption=WARMUP_CORRUPTION)
    # black-box labels generated at dataset-access time (OCRDataset parity)
    tr_imgs = np.stack([s.image for s in train_set.samples])
    va_imgs = np.stack([s.image for s in val_set.samples])
    tr_labels = ocr.get_labels(tr_imgs)
    va_labels = ocr.get_labels(va_imgs)

    # reference train_crnn.py:132 uses plain Adam (no weight decay); the JAX
    # warmup (train/crnn_trainer.py) matches with adam_l2(wd=0.0)
    opt = torch.optim.Adam(crnn.parameters(), lr=3e-4)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=10, gamma=0.8)
    ctc = torch.nn.CTCLoss(blank=charmap.blank_id, zero_infinity=True)
    best_acc, best_state = -1.0, None
    B = 64
    for epoch in range(WARM_EPOCHS):
        crnn.train()
        perm = np.random.permutation(len(train_set))
        for i in range(0, len(perm) - B + 1, B):
            idx = perm[i:i + B]
            imgs = torch.tensor(tr_imgs[idx][:, None])
            imgs = add_noise(imgs)
            texts = [tr_labels[j] for j in idx]
            scores = crnn(imgs)                       # (T, B, V)
            y, y_len = encode_targets(texts, charmap)
            pred_len = torch.full((scores.shape[1],), scores.shape[0],
                                  dtype=torch.long)
            opt.zero_grad()
            loss = ctc(scores, y, pred_len, y_len)
            loss.backward()
            opt.step()
        sched.step()
        crnn.eval()
        with torch.no_grad():
            preds = []
            for i in range(0, len(val_set), B):
                imgs = torch.tensor(va_imgs[i:i + B][:, None])
                preds.extend(greedy_decode(crnn(imgs), charmap))
        crt, _ = compare_labels(preds, va_labels)
        acc = crt / len(val_set)
        print(f"[torch-warmup] epoch {epoch} CRNN-vs-OCR acc {acc:.3f}",
              flush=True)
        if acc > best_acc:
            best_acc = acc
            best_state = {k: v.clone() for k, v in crnn.state_dict().items()}
    crnn.load_state_dict(best_state)
    return crnn, best_acc


# ---------------------------------------------------------------------------
def patch_train(charmap, ocr, crnn, train_set, val_set):
    """The reference two-phase budget loop at batch size 1 document."""
    import torch
    from benchmarks.torch_baseline import build_models

    prep, _ = build_models(charmap.vocab_size)
    opt_crnn = torch.optim.Adam(crnn.parameters(), lr=1e-4, weight_decay=5e-4)
    opt_prep = torch.optim.Adam(prep.parameters(), lr=5e-5, weight_decay=5e-4)
    ctc = torch.nn.CTCLoss(blank=charmap.blank_id, zero_infinity=True)
    mse = torch.nn.MSELoss()

    # Identity pretraining of the prep (MSE(prep(x), x), Adam 1e-3) — the
    # torch analogue of the rebuild's `prep_pretrain_epochs` and of the
    # reference's `--prep_model` warm start. Off by default (the published
    # 96-doc/15-epoch row bootstrapped without it); PREP_PRETRAIN=N enables
    # it for head-to-heads against pipelines that pretrain (quality_run.py
    # defaults to 8) — at 48 docs x 10 epochs the budget loop cannot
    # bootstrap from a random UNet on any implementation.
    pre_epochs = int(os.environ.get("PREP_PRETRAIN", 0))
    if pre_epochs:
        pre_opt = torch.optim.Adam(prep.parameters(), lr=1e-3)
        prep.train()
        B = 2
        for pe in range(pre_epochs):
            tot, nb = 0.0, 0
            order = np.random.permutation(len(train_set))
            for bi in range(0, len(order) - B + 1, B):
                x = torch.stack([
                    torch.tensor(train_set[int(di)].image[None])
                    for di in order[bi:bi + B]])
                pre_opt.zero_grad()
                loss = mse(prep(x), x)
                loss.backward()
                pre_opt.step()
                tot += float(loss)
                nb += 1
            print(f"[torch-patch] prep-pretrain {pe} mse "
                  f"{tot / max(1, nb):.5f}", flush=True)

    sampler = RangeCerSampler({})
    tracked: dict = {}
    best_acc, best_epoch, best_state = 0.0, 0, None
    total_bb = 0

    def decode_gt(sample, rows):
        return charmap.decode(sample.gt_labels[rows], sample.gt_lengths[rows])

    for epoch in range(PATCH_EPOCHS):
        order = np.random.permutation(len(train_set))
        epoch_bb = 0
        t_ep = time.time()
        for di in order:
            sample = train_set[int(di)]
            rows = np.nonzero(sample.strip_mask)[0]
            bboxes = sample.bboxes[rows]
            names = [sample.strip_names[j] for j in rows]
            gts = decode_gt(sample, rows)
            doc = torch.tensor(sample.image[None, None])  # (1,1,H,W)

            # ---------------- phase A: proxy update ----------------------
            crnn.train(); prep.eval()
            opt_crnn.zero_grad(); opt_prep.zero_grad()
            with torch.no_grad():
                cleaned = prep(doc)[0]
            strips_all = torch_text_stack(cleaned, bboxes)   # (S,1,32,128)
            n = len(rows)
            num_bb = max(1, math.ceil(n * (1 - BUDGET_PROP)))
            picked = sampler.query(names, num_bb)
            sel = strips_all[picked].detach()
            sel_names = [names[i] for i in picked]

            for i in range(INNER_LIMIT):
                if i == 0:  # label-tracking clean pass
                    ocr_labels = ocr.get_labels(sel.numpy())
                    # weights from PRE-update history (reference order,
                    # train_nn_patch.py:282-283)
                    weights = gen_decaying_weights(WINDOW_SIZE)
                    for nm, lb in zip(sel_names, ocr_labels):
                        tracked.setdefault(nm, []).append(lb)
                    scores = crnn(sel)
                    pred_len = torch.full((scores.shape[1],), scores.shape[0],
                                          dtype=torch.long)
                    loss = 0.0
                    for depth in range(WINDOW_SIZE):
                        idxs = [k for k, nm in enumerate(sel_names)
                                if len(tracked.get(nm, [])) > depth]
                        if not idxs:
                            continue
                        texts = [tracked[sel_names[k]][-depth - 1] for k in idxs]
                        y, y_len = encode_targets(texts, charmap)
                        loss = loss + weights[depth] * ctc(
                            scores[:, idxs], y, pred_len[idxs], y_len)
                else:       # jitter round
                    noisy = add_noise(sel)
                    ocr_labels = ocr.get_labels(noisy.numpy())
                    scores = crnn(noisy)
                    y, y_len = encode_targets(ocr_labels, charmap)
                    pred_len = torch.full((scores.shape[1],), scores.shape[0],
                                          dtype=torch.long)
                    loss = ctc(scores, y, pred_len, y_len)
                epoch_bb += sel.shape[0]
                total_bb += sel.shape[0]
                if isinstance(loss, torch.Tensor):
                    loss.backward()
            opt_crnn.step()

            # ---------------- phase B: prep update ------------------------
            prep.train(); crnn.train()
            for m in crnn.modules():  # set_bn_eval parity (utils.py:113-115)
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.eval()
            opt_prep.zero_grad(); opt_crnn.zero_grad()
            img_out = prep(doc)[0]
            strips = torch_text_stack(img_out, bboxes)
            scores = crnn(strips)
            y, y_len = encode_targets(gts, charmap)
            pred_len = torch.full((scores.shape[1],), scores.shape[0],
                                  dtype=torch.long)
            loss = ctc(scores, y, pred_len, y_len) + \
                SEC_LOSS_SCALAR * mse(img_out, torch.ones_like(img_out))
            loss.backward()
            preds = greedy_decode(scores, charmap)
            cers = [levenshtein(p, g) / max(1, len(g))
                    for p, g in zip(preds, gts)]
            sampler.update_cer(cers, names)
            opt_prep.step()

        # ---------------- validation ------------------------------------
        prep.eval(); crnn.eval()
        v_crt, v_cnt = 0, 0
        with torch.no_grad():
            for sample in val_set.samples:
                rows = np.nonzero(sample.strip_mask)[0]
                doc = torch.tensor(sample.image[None, None])
                cleaned = prep(doc)[0]
                strips = torch_text_stack(cleaned, sample.bboxes[rows])
                labels = ocr.get_labels(strips.numpy())
                gts = decode_gt(sample, rows)
                crt, _ = compare_labels(labels, gts)
                v_crt += crt
                v_cnt += len(rows)
        acc = v_crt / max(1, v_cnt)
        print(f"[torch-patch] epoch {epoch} val OCR acc {acc:.3f} "
              f"bb {epoch_bb} ({time.time() - t_ep:.0f}s)", flush=True)
        if acc > best_acc:
            best_acc, best_epoch = acc, epoch
            best_state = {k: v.clone() for k, v in prep.state_dict().items()}
    if best_state is not None:
        prep.load_state_dict(best_state)
    return prep, best_acc, best_epoch, total_bb


def held_out_eval(charmap, prep, eval_set):
    """Reference eval_prep scoring: FakeOCR on cleaned and original strips
    of a held-out world, eval-mode OCR (no label normalization)."""
    import torch
    from qea_ocr_tpu.ocr.base import get_ocr_helper

    ocr = get_ocr_helper("Fake", is_eval=True)
    cl_crt = cl_cer = or_crt = or_cer = 0.0
    count = 0
    with torch.no_grad():
        for sample in eval_set.samples:
            rows = np.nonzero(sample.strip_mask)[0]
            gts = charmap.decode(sample.gt_labels[rows], sample.gt_lengths[rows])
            doc = torch.tensor(sample.image[None, None])
            bboxes = sample.bboxes[rows]
            orig = torch_text_stack(doc[0], bboxes)
            o_lbl = ocr.get_labels(orig.numpy())
            crt, cer = compare_labels(o_lbl, gts)
            or_crt += crt; or_cer += cer
            cleaned = prep(doc)[0]
            strips = torch_text_stack(cleaned, bboxes)
            c_lbl = ocr.get_labels(strips.numpy())
            crt, cer = compare_labels(c_lbl, gts)
            cl_crt += crt; cl_cer += cer
            count += len(rows)
    n = max(1, count)
    return dict(cleaned_acc=cl_crt / n, cleaned_cer=cl_cer / n,
                orig_acc=or_crt / n, orig_cer=or_cer / n)


# ---------------------------------------------------------------------------
def main():
    import torch
    from qea_ocr_tpu.data.datasets import PatchDocuments
    from qea_ocr_tpu.ocr.base import get_ocr_helper
    from qea_ocr_tpu.utils.charmap import CharMap

    os.makedirs(OUT, exist_ok=True)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    t0 = time.time()
    charmap = CharMap.default()
    ocr = get_ocr_helper("Fake")

    if os.environ.get("CRNN_ORBAX_CKPT"):
        # shared TPU-warmed proxy (same one the JAX pipeline and the
        # verbatim-reference harness load): orbax -> reference-schema
        # state_dict -> the torch twin's key names
        from benchmarks.torch_baseline import build_models
        from qea_ocr_tpu.tools.export_torch import (
            load_into_twin_crnn, state_dict_from_crnn, _load_state)
        from qea_ocr_tpu.models import CRNN as JaxCRNN
        variables = _load_state(os.environ["CRNN_ORBAX_CKPT"],
                                JaxCRNN(vocab_size=charmap.vocab_size),
                                (32, 128))
        _, crnn = build_models(charmap.vocab_size)
        load_into_twin_crnn(crnn, state_dict_from_crnn(variables))
        print(f"[torch-warmup] shared proxy loaded from "
              f"{os.environ['CRNN_ORBAX_CKPT']}", flush=True)
    else:
        crnn, warm_acc = warmup_crnn(charmap, ocr)
        print(f"[torch-warmup] best acc {warm_acc:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    train_set = PatchDocuments.synthetic(
        TRAIN_DOCS, seed=SEED, n_strips=STRIPS_PER_DOC,
        max_strips=STRIPS_PER_DOC, corruption=CORRUPTION, doc_size=DOC_SIZE)
    val_set = PatchDocuments.synthetic(
        VAL_DOCS, seed=SEED + 1, n_strips=STRIPS_PER_DOC,
        max_strips=STRIPS_PER_DOC, corruption=CORRUPTION, doc_size=DOC_SIZE)
    eval_set = PatchDocuments.synthetic(
        EVAL_DOCS, seed=1234, n_strips=STRIPS_PER_DOC,
        max_strips=STRIPS_PER_DOC, corruption=CORRUPTION, doc_size=DOC_SIZE)

    prep, best_acc, best_epoch, total_bb = patch_train(
        charmap, ocr, crnn, train_set, val_set)
    print(f"[torch-patch] best val acc {best_acc:.3f} @ {best_epoch}, "
          f"total bb calls {total_bb} ({time.time() - t0:.0f}s)", flush=True)

    result = held_out_eval(charmap, prep, eval_set)
    result.update(best_train_val_acc=best_acc,
                  budget=round(1 - BUDGET_PROP, 4),
                  train_docs=TRAIN_DOCS, epochs=PATCH_EPOCHS,
                  total_seconds=round(time.time() - t0, 1),
                  impl="torch-reference")
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("[torch-ref summary]", json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
