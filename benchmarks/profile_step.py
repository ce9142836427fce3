"""Per-component roofline profiler for the two-phase patch step.

Times each jitted piece of the production training step (96 docs x 16 strip
slots, (400, 512) documents) with host-synced timing, then the UNet's
internal blocks at their exact shapes. This is how `benchmarks/RESULTS.md`'s
"where the milliseconds go" table was measured; rerun after any kernel or
model-layout change.

Usage:  python benchmarks/profile_step.py [--docs 96] [--blocks]

All jitted pieces return scalars (or are synced via a scalar fetch) so the
timings measure device compute, not the tunneled host link.
"""

from __future__ import annotations

import argparse
import sys
import time


def _sync(x):
    """Host-sync on ONE ELEMENT of the first leaf: fetching a whole leaf
    (e.g. prep_extract's (96,1,400,512) doc_out, 78 MB) rides the tunneled
    host link and inflated that phase's reading by ~70 ms."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    jax.device_get(leaf[idx] if idx else leaf)


def _timeit(name, fn, n=10):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def profile_step(D=96, S=16):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from qea_ocr_tpu import config as C
    from qea_ocr_tpu.models import CRNN, UNet
    from qea_ocr_tpu.tracking import decaying_weights
    from qea_ocr_tpu.train.patch_steps import make_steps
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.charmap import CharMap
    from qea_ocr_tpu.utils.platform import default_mxu_packed

    doc_size = C.DOC_SIZE
    cm = CharMap.default()
    L, W, N = cm.max_len, 1, D * S
    # production layout split: grad path pinned XLA NHWC, no-grad forwards
    # resolve `auto` (= xla unless QEA_CONV_IMPL=cmajor) — see
    # train/patch_steps.make_steps
    prep = UNet(mxu_packed=default_mxu_packed(), conv_impl="xla")
    prep_eval = UNet(mxu_packed=default_mxu_packed())
    crnn = CRNN(vocab_size=cm.vocab_size)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    prep_state = ModelState.create(
        prep.init(k1, jnp.zeros((1, 1, *doc_size)), train=False),
        adam_l2(5e-5, 5e-4))
    crnn_state = ModelState.create(
        crnn.init(k2, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False),
        adam_l2(1e-4, 5e-4))
    steps = make_steps(prep, crnn, cm, prep_eval_model=prep_eval)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((D, 1, *doc_size), dtype=np.float32))
    bboxes = np.zeros((D, S, 4), np.int32)
    bboxes[..., 0] = rng.integers(0, 380, (D, S))
    bboxes[..., 1] = rng.integers(0, 360, (D, S))
    bboxes[..., 2] = bboxes[..., 0] + rng.integers(16, 127, (D, S))
    bboxes[..., 3] = bboxes[..., 1] + rng.integers(10, 31, (D, S))
    bboxes = jnp.asarray(bboxes)
    strip_mask = jnp.ones((D, S), bool)
    gt_labels = jnp.asarray(
        np.where(np.arange(L)[None, None] < 8,
                 rng.integers(1, cm.vocab_size, (D, S, L)),
                 cm.pad_id).astype(np.int32))
    gt_lengths = jnp.full((D, S), 8, jnp.int32)
    strip_ids = jnp.arange(N, dtype=jnp.int32).reshape(D, S)
    cer_table = jnp.ones((N,), jnp.float32)
    ent_table = jnp.ones((N,), jnp.float32)
    hist_labels = jnp.broadcast_to(gt_labels.reshape(N, 1, L), (N, W, L))
    hist_lengths = jnp.full((N, W), 8, jnp.int32)
    hist_valid = jnp.ones((N, W), bool)
    lw = decaying_weights(0.7, W)
    bb_mask = jnp.ones((N,), bool)

    _, strips = steps.prep_extract(prep_state, images, bboxes)
    strips = jnp.asarray(jax.device_get(strips))

    t_ex = _timeit("prep_extract (UNet eval fwd + gather)",
                   lambda: steps.prep_extract(prep_state, images, bboxes)[1])

    st = {"crnn": crnn_state}

    def pa():
        s, loss = steps.phase_a(
            st["crnn"], strips, bb_mask, hist_labels, hist_lengths,
            hist_valid, lw, strips[None], hist_labels[:, 0][None],
            hist_lengths[:, 0][None], decaying=True, inner_limit_skip=True)
        st["crnn"] = s
        return loss

    t_a = _timeit("phase_a (history + jitter CRNN update)", pa)

    st2 = {"prep": prep_state, "crnn": st["crnn"],
           "cer": cer_table, "ent": ent_table}

    def pb():
        p, c, doc, m, ct, et = steps.phase_b(
            st2["prep"], st2["crnn"], images, bboxes, strip_mask, gt_labels,
            st2["cer"], st2["ent"], gt_lengths, strip_ids, update_crnn=False)
        st2.update(prep=p, crnn=c, cer=ct, ent=et)
        return m["loss"]

    t_b = _timeit("phase_b (prep update + CER/entropy)", pb)
    tot = t_ex + t_a + t_b
    print(f"{'sum of parts':42s} {tot * 1e3:8.2f} ms "
          f"-> {D / tot:.1f} docs/s (pipelined loop runs faster)")
    return st2


def profile_unet_blocks(D=96):
    """fwd+bwd time of each UNet block at its exact production shape."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from qea_ocr_tpu.models import UNet
    from qea_ocr_tpu.models.unet import UNetBlock

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((D, 1, 400, 512), dtype=np.float32))
    prep = UNet()
    pv = prep.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 400, 512)),
                   train=False)

    f_eval = jax.jit(lambda v, x: prep.apply(v, x, train=False).mean())
    _timeit("UNet eval fwd", lambda: f_eval(pv, images))
    g = jax.jit(jax.value_and_grad(lambda p, x: prep.apply(
        {"params": p, "batch_stats": pv["batch_stats"]}, x, train=True,
        mutable=["batch_stats"])[0].mean()))
    _timeit("UNet train fwd+bwd", lambda: g(pv["params"], images)[0])

    shapes = [  # (H, W, Cin, feat, tag) — encoder, bottleneck, decoder
        (400, 512, 1, 32, "enc1"),
        (200, 256, 32, 64, "enc2"),
        (100, 128, 64, 128, "enc3"),
        (50, 64, 128, 256, "enc4"),
        (25, 32, 256, 512, "bottleneck"),
        (50, 64, 512, 256, "dec4"),
        (100, 128, 256, 128, "dec3"),
        (200, 256, 128, 64, "dec2"),
        (400, 512, 64, 32, "dec1"),
    ]
    for (h, w, cin, feat, tag) in shapes:
        x = jnp.asarray(rng.random((D, h, w, cin), dtype=np.float32))
        blk = UNetBlock(feat)
        bv = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, cin)),
                      train=False)
        gg = jax.jit(jax.value_and_grad(lambda p, x, blk=blk, bv=bv: blk.apply(
            {"params": p, "batch_stats": bv["batch_stats"]}, x, train=True,
            mutable=["batch_stats"])[0].mean()))
        _timeit(f"block {tag} {h}x{w} c{cin}->{feat}",
                lambda: gg(bv["params"], x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=96)
    ap.add_argument("--blocks", action="store_true",
                    help="also profile UNet internals (slow: ~10 compiles)")
    args = ap.parse_args()
    sys.path.insert(0, ".")
    profile_step(D=args.docs)
    if args.blocks:
        profile_unet_blocks(D=args.docs)


if __name__ == "__main__":
    main()
