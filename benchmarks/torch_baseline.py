"""PyTorch baseline for the bench denominator.

The reference repo measures no throughput (BASELINE.md), so the harness
reproduces its per-step device compute from the architecture spec —
UNet(32f) document cleaning at (1, 1, 400, 512), per-strip crop+pad, CRNN
conv->BiLSTM CTC forward/backward in the reference's two-phase structure
with batch size 1 document (`train_nn_patch.py:37`) — and times documents/s
on whatever torch device is available (CPU in this image; the reference ran
a V100). OCR time is excluded on both sides: this measures the compute path
the TPU rebuild replaces.

This is an independent implementation from the paper/architecture spec, not
a copy of the reference code.
"""

from __future__ import annotations

import time
from typing import List

import numpy as np


def build_models(vocab_size: int = 95):
    import torch
    import torch.nn as nn

    class ConvLadder(nn.Module):
        def __init__(self):
            super().__init__()
            c = nn.Conv2d
            self.net1 = nn.Sequential(c(1, 64, 3, padding=1), nn.ReLU(), nn.MaxPool2d((2, 2)))
            self.net2 = nn.Sequential(c(64, 128, 3, padding=1), nn.ReLU(), nn.MaxPool2d((2, 2)))
            self.net3 = nn.Sequential(c(128, 256, 3, padding=1), nn.ReLU())
            self.net4 = nn.Sequential(c(256, 256, 3, padding=1), nn.ReLU(), nn.MaxPool2d((2, 1)))
            self.net5 = nn.Sequential(c(256, 512, 3, padding=1), nn.BatchNorm2d(512), nn.ReLU())
            self.net6 = nn.Sequential(c(512, 512, 3, padding=1), nn.BatchNorm2d(512), nn.ReLU(), nn.MaxPool2d((2, 1)))
            self.net7 = c(512, 512, 2)

        def forward(self, x):
            for m in (self.net1, self.net2, self.net3, self.net4, self.net5, self.net6, self.net7):
                x = m(x)
            return x

    class ProxyCRNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = ConvLadder()
            self.rnn = nn.LSTM(512, 256, 2, bidirectional=True)
            self.head = nn.Linear(512, vocab_size)

        def forward(self, x):
            f = self.conv(x)                       # (B, 512, 1, 31)
            b, ch, h, w = f.shape
            seq = f.permute(3, 0, 1, 2).reshape(w, b, ch * h)
            out, _ = self.rnn(seq)
            return torch.log_softmax(self.head(out), dim=2)

    def block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    class PrepUNet(nn.Module):
        def __init__(self, f=32):
            super().__init__()
            self.e1, self.e2 = block(1, f), block(f, f * 2)
            self.e3, self.e4 = block(f * 2, f * 4), block(f * 4, f * 8)
            self.bott = block(f * 8, f * 16)
            self.pool = nn.MaxPool2d(2)
            self.u4 = nn.ConvTranspose2d(f * 16, f * 8, 2, 2)
            self.d4 = block(f * 16, f * 8)
            self.u3 = nn.ConvTranspose2d(f * 8, f * 4, 2, 2)
            self.d3 = block(f * 8, f * 4)
            self.u2 = nn.ConvTranspose2d(f * 4, f * 2, 2, 2)
            self.d2 = block(f * 4, f * 2)
            self.u1 = nn.ConvTranspose2d(f * 2, f, 2, 2)
            self.d1 = block(f * 2, f)
            self.out = nn.Conv2d(f, 1, 1)

        def forward(self, x):
            e1 = self.e1(x)
            e2 = self.e2(self.pool(e1))
            e3 = self.e3(self.pool(e2))
            e4 = self.e4(self.pool(e3))
            b = self.bott(self.pool(e4))
            d4 = self.d4(torch.cat([self.u4(b), e4], 1))
            d3 = self.d3(torch.cat([self.u3(d4), e3], 1))
            d2 = self.d2(torch.cat([self.u2(d3), e2], 1))
            d1 = self.d1(torch.cat([self.u1(d2), e1], 1))
            return torch.sigmoid(self.out(d1))

    import torch
    return PrepUNet(), ProxyCRNN()


def crop_pad(doc, bboxes):
    """Reference get_text_stack: per-bbox crop + center white pad to 32x128."""
    import torch
    strips = []
    for (x0, y0, x1, y1) in bboxes:
        crop = doc[:, y0:y1, x0:x1]
        _, h, w = crop.shape
        pl = (128 - w) // 2
        pt = (32 - h) // 2
        strips.append(torch.nn.functional.pad(
            crop, (pl, 128 - pl - w, pt, 32 - pt - h), value=1.0))
    return torch.stack(strips)


def run_baseline(n_docs: int = 4, strips_per_doc: int = 16,
                 warmup: int = 1, device: str = "cpu") -> float:
    """Returns documents/second for the reference-shaped two-phase step."""
    import torch
    torch.manual_seed(0)
    prep, crnn = build_models()
    prep.to(device).train()
    crnn.to(device).train()
    opt_p = torch.optim.Adam(prep.parameters(), lr=5e-5, weight_decay=5e-4)
    opt_c = torch.optim.Adam(crnn.parameters(), lr=1e-4, weight_decay=5e-4)
    ctc = torch.nn.CTCLoss()
    mse = torch.nn.MSELoss()

    rng = np.random.default_rng(0)
    docs = torch.rand(n_docs + warmup, 1, 400, 512, device=device)
    all_bboxes: List[List[tuple]] = []
    for _ in range(n_docs + warmup):
        bbs = []
        for _ in range(strips_per_doc):
            x0 = int(rng.integers(0, 380)); y0 = int(rng.integers(0, 360))
            bbs.append((x0, y0, x0 + int(rng.integers(16, 127)),
                        y0 + int(rng.integers(10, 31))))
        all_bboxes.append(bbs)
    targets = torch.randint(1, 95, (strips_per_doc, 8), dtype=torch.int32)
    t_len = torch.full((strips_per_doc,), 8, dtype=torch.int32)

    def step(i):
        doc = docs[i:i + 1]
        # phase A: proxy update on cleaned strips (1 tracking + 1 jitter pass)
        crnn.zero_grad()
        with torch.no_grad():
            cleaned = prep(doc)[0]
        for _ in range(2):
            strips = crop_pad(cleaned, all_bboxes[i])
            scores = crnn(strips)
            p_len = torch.full((strips_per_doc,), scores.shape[0], dtype=torch.int32)
            loss = ctc(scores, targets.flatten(), p_len, t_len)
            loss.backward()
        opt_c.step()
        # phase B: prep update through crop+pad with CTC(GT) + MSE(white)
        prep.zero_grad(); crnn.zero_grad()
        out = prep(doc)[0]
        strips = crop_pad(out, all_bboxes[i])
        scores = crnn(strips)
        p_len = torch.full((strips_per_doc,), scores.shape[0], dtype=torch.int32)
        loss = ctc(scores, targets.flatten(), p_len, t_len) + mse(
            out, torch.ones_like(out))
        loss.backward()
        opt_p.step()

    for i in range(warmup):
        step(i)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + n_docs):
        step(i)
    dt = time.perf_counter() - t0
    return n_docs / dt
