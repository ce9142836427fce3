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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=96)
    ap.add_argument("--size", type=int, nargs=2, default=(400, 512))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--convs", action="store_true",
                    help="also time the 8 shallow fused convs in isolation")
    args = ap.parse_args()
    h, w = args.size
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
