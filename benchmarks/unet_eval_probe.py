"""UNet EVAL-forward A/B at the production document batch: XLA NHWC vs the
channel-major padded-flat Pallas path (fused BN+ReLU epilogue by default;
QEA_CMAJOR_FUSED=0 to time the unfused chain).

    python benchmarks/unet_eval_probe.py [--docs 96] [--size 400 512]

This is the integration measurement for `ops/pallas/conv_cmajor.py` — the
no-grad forwards (prep_extract, val_forward, serving) are the only places
the cmajor path may run (its grad OOMs at document batches; see
models/unet.py). Timing is host-synced via `jax.device_get` of a scalar
(`block_until_ready` does not flush on the tunneled platform).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax                              # noqa: E402
import jax.numpy as jnp                 # noqa: E402
import numpy as np                      # noqa: E402

from qea_ocr_tpu.models import UNet     # noqa: E402


def timeit(fn, iters=10):
    float(jax.device_get(fn()))         # compile + warm
    float(jax.device_get(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1e3


def probe_fused_convs(d):
    """Per-conv time of the 8 shallow fused convs at production shapes —
    isolates the kernel from the layout glue (pad_flat, upconv
    interleaves, skip concats, custom-call layout copies) that the
    integrated forward adds on top."""
    from qea_ocr_tpu.ops.pallas.conv_cmajor import conv_flat_bn_relu

    shapes = [  # (tag, cin, cout, H, W) — enc1.c0 cin padded 1->16
        ("enc1.c0", 16, 32, 400, 512), ("enc1.c1", 32, 32, 400, 512),
        ("enc2.c0", 32, 64, 200, 256), ("enc2.c1", 64, 64, 200, 256),
        ("dec2.c0", 128, 64, 200, 256), ("dec2.c1", 64, 64, 200, 256),
        ("dec1.c0", 96, 32, 400, 512), ("dec1.c1", 32, 32, 400, 512),
    ]
    rng = np.random.default_rng(0)
    total = 0.0
    for tag, cin, cout, h, w in shapes:
        xf = jnp.asarray(rng.random((d, cin, (h + 2) * w),
                                    dtype=np.float32)).astype(jnp.bfloat16)
        wk = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout))
                         .astype(np.float32))
        mul = jnp.ones((cout,), jnp.float32)
        add = jnp.zeros((cout,), jnp.float32)
        # reduce a thin slice only: the pallas_call has side effects so the
        # conv still runs in full, but the readback doesn't add a 2.5 GB
        # f32 materialize+reduce pass to every sample.
        f = jax.jit(lambda a, k: conv_flat_bn_relu(
            a, k.astype(jnp.bfloat16), mul, add, h, w)[:, :, ::4096]
            .astype(jnp.float32).mean())
        ms = timeit(lambda: f(xf, wk), iters=10)
        total += ms
        print(f"fused conv {tag} c{cin}->{cout} {h}x{w}: {ms:6.2f} ms")
    print(f"fused shallow convs total: {total:.1f} ms")


def probe_chained_floor(d, h=400, w=512, iters=10):
    """FLAT-RESIDENT FLOOR: the 8 shallow fused convs chained back-to-back
    in the padded-flat layout with only the irreducible glue — one
    pad_flat at entry, a flat 2x2 pool + re-pad between encoder levels, a
    flat channel concat per decoder level, and an unflat+repeat+pad
    stand-in for the parity-interleave upconv. This LOWER-BOUNDS any
    flat-resident cmajor UNet eval forward: the real network adds the
    three deep levels, true ConvTranspose upconvs, the cin=1 entry pad,
    and the final 1x1+sigmoid+unflat. Decision rule (VERDICT r3 item 3):
    if this floor is not clearly below the XLA NHWC FULL forward (81.2 ms
    at D=96), the flat-resident build cannot win and the kernel retires
    from the document path."""
    from qea_ocr_tpu.models.unet import _flat_pool
    from qea_ocr_tpu.ops.pallas.conv_cmajor import (
        conv_flat_bn_relu, pad_flat, unflat)

    rng = np.random.default_rng(0)
    f = 32

    def wk(cin, cout):
        return jnp.asarray(
            0.1 * rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)

    def mladd(cout):
        return jnp.ones((cout,), jnp.float32), jnp.zeros((cout,), jnp.float32)

    ws = dict(
        e1c0=wk(16, f), e1c1=wk(f, f),
        e2c0=wk(f, 2 * f), e2c1=wk(2 * f, 2 * f),
        d2c0=wk(4 * f, 2 * f), d2c1=wk(2 * f, 2 * f),
        d1c0=wk(3 * f, f), d1c1=wk(f, f),
    )

    def chain(x, ws):
        def cv(xf, key, hh, ww):
            m, a = mladd(ws[key].shape[-1])
            return conv_flat_bn_relu(xf, ws[key], m, a, hh, ww)

        h2, w2 = h // 2, w // 2
        # entry: cin 1 -> 16 zero-pad (kernel needs >=8 sublanes), one pad_flat
        xf = pad_flat(jnp.pad(x, ((0, 0), (0, 15), (0, 0), (0, 0))))
        e1 = cv(cv(xf, "e1c0", h, w), "e1c1", h, w)          # (D, f, flat)
        p1 = pad_flat(_flat_pool(e1, h, w))                   # level glue
        e2 = cv(cv(p1, "e2c0", h2, w2), "e2c1", h2, w2)       # (D, 2f, flat)
        # decoder @ 200x256: skip concat in flat layout (emulated up = e2)
        d2in = jnp.concatenate([e2, e2], axis=1)              # 4f channels
        d2 = cv(cv(d2in, "d2c0", h2, w2), "d2c1", h2, w2)     # (D, 2f, flat)
        # upconv stand-in: unflat + 2x2 repeat + re-pad (same traffic class
        # as the parity-interleave)
        up = unflat(d2, h2, w2)
        up = jnp.repeat(jnp.repeat(up, 2, axis=2), 2, axis=3)
        d1in = jnp.concatenate([pad_flat(up), e1], axis=1)    # 3f channels
        d1 = cv(cv(d1in, "d1c0", h, w), "d1c1", h, w)         # (D, f, flat)
        # thin-slice readback (same convention as probe_fused_convs)
        return d1[:, :, ::4096].astype(jnp.float32).mean()

    x = jnp.asarray(rng.random((d, 1, h, w), dtype=np.float32))
    fj = jax.jit(chain)
    ms = timeit(lambda: fj(x, ws), iters=iters)
    print(f"flat-resident shallow chain (8 fused convs + pools/concats/"
          f"up stand-in) D={d} ({h},{w}): {ms:.1f} ms")
    print("decision: floor must sit CLEARLY below the XLA full forward "
          "(81.2 ms at D=96) to justify the flat-resident build — the "
          "real net still adds deep levels, true upconvs, and the output "
          "head on top of this number.")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=96)
    ap.add_argument("--size", type=int, nargs=2, default=(400, 512))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--convs", action="store_true",
                    help="also time the 8 shallow fused convs in isolation")
    ap.add_argument("--chain", action="store_true",
                    help="time the flat-resident shallow-chain FLOOR "
                         "(finish-or-retire decision probe)")
    args = ap.parse_args()
    h, w = args.size
    if args.chain:
        probe_chained_floor(args.docs, h, w, iters=args.iters)
        return
    if args.convs:
        probe_fused_convs(args.docs)
        return

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.docs, 1, h, w), dtype=np.float32))
    variables = UNet(conv_impl="xla").init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, h, w)), train=False)

    results = {}
    for impl in ("xla", "cmajor"):
        model = UNet(conv_impl=impl)
        f = jax.jit(lambda v, a, m=model: m.apply(v, a, train=False).mean())
        ms = timeit(lambda: f(variables, x), iters=args.iters)
        results[impl] = ms
        print(f"UNet eval fwd D={args.docs} ({h},{w}) {impl:7s}: "
              f"{ms:7.1f} ms")
    print(f"cmajor/xla: {results['cmajor'] / results['xla']:.2f}x "
          f"({'cmajor wins' if results['cmajor'] < results['xla'] else 'xla wins'})")


if __name__ == "__main__":
    main()
